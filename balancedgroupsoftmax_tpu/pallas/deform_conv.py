"""Fused deformable-conv forward kernel (Pallas, TPU).

Replaces the hot path of /root/reference/mmdet/ops/dcn/src/
deform_conv_cuda_kernel.cu (deformable_im2col + GEMM) with ONE kernel
that never materializes the (H, W, taps, C) im2col in HBM — the
dominant cost of the XLA gather formulation (BENCHMARKS round 5: the
bilinear gather is ~80% of every DCN layer).

Formulation (per output row-block, per C_in chunk):

  1. The image is zero-padded by (padding + D) so every sample position
     with offsets clamped to +-D cells lands inside a static WIN-row
     window per row-block — the same bounded-deformation semantics as
     ops/deform_conv.py _shift_window_cols (exact when |offset| <= D).
  2. Bilinear interpolation is separable: per tap, build one-hot
     interpolation weight matrices Wx (samples, Wp) / Wy (samples, WIN)
     from the offsets on the VPU (2 nonzeros per row — the CUDA
     bilinear fractions; image-validity and the v2 modulation mask fold
     into Wy).
  3. Stage X runs on the MXU: for each window row y,
     xi_y = Wx @ xwin[y]  — an (S, Wp) x (Wp, Cc) matmul whose "wasted"
     lanes replace 302k serialized gather descriptors per c4 layer.
  4. Stage Y is a WIN-term VPU accumulation cols[s] += Wy[s, y] * xi_y.
  5. The grouped conv GEMM is fused in: per tap k,
     out += cols_k @ W_dense[k, chunk] against the block-diagonal dense
     weight (ops/deform_conv.py DENSE_GROUPS rationale), accumulated
     f32 across C_in chunks in the revisited output block.

Gradients: `deform_conv2d_batched` wraps the kernel in a custom_vjp
whose backward is the XLA shift-decomposition path at the same D —
identical clamp semantics, and its transpose is a sum of pads (no
scatter), unlike the gather path's atomicAdd-analogue scatter-add.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(
    off_ref,  # (1, 2*taps, RB, W) f32 — tap-major so the kernel can
    # pl.ds-slice per tap (Mosaic has no dynamic_slice on values)
    xp_ref,  # (B, Hp, Wp, C) image dtype, HBM-resident (pl.ANY) — the
    # kernel DMAs its own (WIN, Wp, Cc) window per grid step instead of
    # reading pre-materialized overlapping windows (which cost a
    # WIN/(RB*stride)-fold duplicate of every feature map in HBM)
    w_ref,  # (1, taps, Cc, C_out) image dtype (C_in-chunk-major dense wgt)
    mask_ref,  # (1, taps, RB, W) f32 or None (v2 modulation)
    out_ref,  # (1, RB, W, C_out) f32 — revisited across the cc grid dim
    wx_ref,  # scratch (taps*POS, Wp) in the image dtype (bf16 weights
    # round exactly like the gather path's wc() cast; saves the scratch
    # AND the pre-matmul copy that OOM'd the strided c3 block)
    wy_ref,  # scratch (taps*POS, WIN) f32
    cols_ref,  # scratch (taps*POS, Cc) f32
    xw_ref,  # scratch (2, WIN, Wp, Cc) image dtype — double-buffered
    # DMA landing slabs: step L waits slot L%2 (started by step L-1's
    # prefetch) and starts slot (L+1)%2 for the next grid step, so the
    # window fetch hides behind compute
    dma_sem,  # (2,) DMA semaphores, one per slot
    *,
    kh: int,
    kw: int,
    stride: int,
    padding: int,
    window: int,
    h: int,
    w_img: int,
    rb: int,
    w_out: int,
    n_rb: int,
    aligned: bool = False,
    n_buf: int = 2,
):
    taps = kh * kw
    pos = rb * w_out
    wp = xw_ref.shape[2]
    win = xw_ref.shape[1]
    cc = xw_ref.shape[3]
    c_out = out_ref.shape[3]
    blk = pl.program_id(0)  # fused (batch, row-block) index
    cout = pl.program_id(1)  # C_out chunk index
    cin = pl.program_id(2)  # C_in chunk index (innermost)
    rbi = blk % n_rb  # row-block within the image
    b_idx = blk // n_rb

    n_co = pl.num_programs(1)
    n_ci = pl.num_programs(2)
    total = pl.num_programs(0) * n_co * n_ci
    lin = (blk * n_co + cout) * n_ci + cin
    slot = jax.lax.rem(lin, 2) if n_buf == 2 else 0

    def window_dma(t, ci, to_slot):
        return pltpu.make_async_copy(
            xp_ref.at[
                t // n_rb,
                pl.ds((t % n_rb) * rb * stride, win),
                :,
                pl.ds(ci * cc, cc),
            ],
            xw_ref.at[to_slot],
            dma_sem.at[to_slot],
        )

    if n_buf == 2:

        @pl.when(lin == 0)
        def _bootstrap():
            window_dma(blk, cin, slot).start()

        # prefetch the NEXT grid step's window into the other slot
        # before waiting on ours — the fetch overlaps this step's compute
        @pl.when(lin + 1 < total)
        def _prefetch():
            nxt = lin + 1
            nci = jax.lax.rem(nxt, n_ci)
            rest = nxt // n_ci
            nt = rest // n_co
            window_dma(nt, nci, 1 - slot).start()

    else:
        # single-buffered fallback for VMEM-tight (f32 full-scale) layers:
        # no prefetch overlap, but half the landing-slab footprint
        window_dma(blk, cin, 0).start()

    @pl.when((cin == 0) & (cout == 0))
    def _build_weights():
        # output-row/col index of each sample within the tile
        ii = jax.lax.broadcasted_iota(jnp.int32, (rb, w_out), 0).astype(
            jnp.float32
        )
        jj = jax.lax.broadcasted_iota(jnp.int32, (rb, w_out), 1).astype(
            jnp.float32
        )
        # absolute output row of the tile's first row
        i0 = (rbi * rb).astype(jnp.float32) if isinstance(rbi, jnp.ndarray) else rbi * rb
        # 3D weight builds keep the lane (minor) dim = Wp/WIN so the final
        # (RB, W, Wp) -> (POS, Wp) reshape only merges leading dims —
        # Mosaic cannot shape-cast lanes into sublanes
        iota_w3 = jax.lax.broadcasted_iota(
            jnp.int32, (rb, w_out, wp), 2
        ).astype(jnp.float32)
        iota_h3 = jax.lax.broadcasted_iota(
            jnp.int32, (rb, w_out, win), 2
        ).astype(jnp.float32)
        for k in range(taps):
            ky = float(k // kw)
            kx = float(k % kw)
            dy = jnp.clip(
                off_ref[0, 2 * k], -float(window), float(window)
            )
            dx = jnp.clip(
                off_ref[0, 2 * k + 1], -float(window), float(window)
            )
            # window-local sampling coords (see module docstring): the
            # window of row-block rbi starts at padded-image row
            # rbi*RB*stride, and padded row = img row + padding + window
            ly = ii * stride + ky + dy + window  # in [0, WIN-1]
            lx = jj * stride + kx + dx + window  # in [0, Wp-1]
            # absolute (unpadded) position for the CUDA validity rule
            y_abs = (i0 + ii) * stride - padding + ky + dy
            x_abs = jj * stride - padding + kx + dx
            valid = (
                (y_abs > -1.0) & (y_abs < h) & (x_abs > -1.0) & (x_abs < w_img)
            ).astype(jnp.float32)
            if mask_ref is not None:
                valid = valid * mask_ref[0, k]
            fly = jnp.floor(ly)[:, :, None]
            flx = jnp.floor(lx)[:, :, None]
            fry = ly[:, :, None] - fly
            frx = lx[:, :, None] - flx
            wx = jnp.where(iota_w3 == flx, 1.0 - frx, 0.0) + jnp.where(
                iota_w3 == flx + 1.0, frx, 0.0
            )
            wy = (
                jnp.where(iota_h3 == fly, 1.0 - fry, 0.0)
                + jnp.where(iota_h3 == fly + 1.0, fry, 0.0)
            ) * valid[:, :, None]
            wx_ref[k * pos : (k + 1) * pos, :] = wx.reshape(pos, wp).astype(
                wx_ref.dtype
            )
            wy_ref[k * pos : (k + 1) * pos, :] = wy.reshape(pos, win)

    # stage X (MXU) + stage Y (VPU): cols[s, c] = sum_y Wy[s,y] (Wx @ xwin[y])[s, c]
    xdt = xw_ref.dtype
    # f32 inputs (tests / f32 serving) must not silently lower to
    # one-pass-bf16 MXU passes; bf16 (production) runs at full rate
    prec = jax.lax.Precision.HIGHEST if xdt == jnp.float32 else None
    wxm = wx_ref[:, :]
    cols_ref[:, :] = jnp.zeros((taps * pos, cc), jnp.float32)
    window_dma(blk, cin, slot).wait()

    # static unrolls, but every iteration ACCUMULATES THROUGH THE SCRATCH
    # REF: carrying the accumulator as a value let Mosaic keep all WIN xi
    # temporaries live at once and blew scoped VMEM (18 MB at WIN=12,
    # C=1024); ref round-trips sequence the iterations so the stack
    # allocator can reuse one xi buffer (dynamic lane indexing is not an
    # option — lane slices must be 128-aligned)
    for y in range(win):
        xi = jnp.dot(
            wxm, xw_ref[slot, y], preferred_element_type=jnp.float32,
            precision=prec,
        )
        cols_ref[:, :] = cols_ref[:, :] + wy_ref[:, y : y + 1] * xi

    if aligned:
        # chunk-diagonal mode: each out block is visited exactly once
        out_ref[0] = jnp.zeros((rb, w_out, c_out), jnp.float32)
    else:

        @pl.when(cin == 0)
        def _zero_out():
            out_ref[0] = jnp.zeros((rb, w_out, c_out), jnp.float32)

    # fused grouped-conv GEMM against the block-diagonal dense weight,
    # accumulated across C_in chunks in the revisited out block
    for k in range(taps):
        part = jnp.dot(
            cols_ref[k * pos : (k + 1) * pos, :].astype(xdt),
            w_ref[0, k],
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        out_ref[0] = out_ref[0] + part.reshape(rb, w_out, c_out)


def _vmem_estimate(
    cc, coc, s_samp, wp, win, rb, w_out, taps, xbytes, n_buf=2
):
    """Rough scoped-VMEM bytes for one kernel instance. Mosaic's stack
    allocator keeps more temporaries live than the naive sum (the
    unrolled weight-build/tap loops), so callers apply a ~2x fudge."""
    return (
        s_samp * wp * xbytes  # wx scratch
        + s_samp * win * 4  # wy scratch
        + 2 * s_samp * cc * 4  # cols scratch + one live xi
        + n_buf * win * wp * cc * xbytes  # window landing slabs
        + 2 * taps * cc * coc * xbytes  # weight block x pipeline buffers
        + 2 * rb * w_out * coc * 4  # out block x pipeline buffers
        + 2 * rb * w_out * wp * 4  # weight-build temporaries (per tap)
    )


def _fused_forward(
    x: jnp.ndarray,  # (B, H, W, C_in)
    offsets: jnp.ndarray,  # (B, H_out, W_out, 2*taps) f32
    w_dense: jnp.ndarray,  # (taps * C_in, C_out) block-diag dense weight
    mask: jnp.ndarray | None,  # (B, H_out, W_out, taps) f32 (v2) or None
    kh: int,
    kw: int,
    stride: int,
    padding: int,
    window: int,
    row_block: int = 2,
    interpret: bool = False,
    groups: int = 1,
) -> jnp.ndarray:
    b, h, w_img, c_in = x.shape
    h_out, w_out = offsets.shape[1], offsets.shape[2]
    taps = kh * kw
    c_out = w_dense.shape[1]
    d = window
    # strided (first-block) layers double POS per row-block and their
    # window/Wp spans; a single output row per tile keeps them in VMEM
    rbs = 1 if stride > 1 else row_block
    n_rb = -(-h_out // rbs)
    win = (rbs - 1) * stride + kh + 2 * d
    pad_t = padding + d
    # windows only read up to the computed extents; the max() guards the
    # strided case where the grid extent underestimates the source rows.
    # Wp rounds to the bf16 sublane tile (16) — the in-kernel window DMA
    # requires tile-aligned extents in the second-minor dim
    wp = _ceil_to(max((w_out - 1) * stride + kw + 2 * d, pad_t + w_img), 16)
    hp = max((n_rb * rbs - 1) * stride + kh + 2 * d, pad_t + h)

    xp = jnp.zeros((b, hp, wp, c_in), x.dtype)
    xp = jax.lax.dynamic_update_slice(xp, x, (0, pad_t, pad_t, 0))

    pad_rows = n_rb * rbs - h_out
    off_p = jnp.pad(offsets, ((0, 0), (0, pad_rows), (0, 0), (0, 0)))
    off_p = (
        off_p.reshape(b * n_rb, rbs, w_out, 2 * taps)
        .transpose(0, 3, 1, 2)
        .astype(jnp.float32)
    )
    if mask is not None:
        mask_p = jnp.pad(mask, ((0, 0), (0, pad_rows), (0, 0), (0, 0)))
        mask_p = (
            mask_p.reshape(b * n_rb, rbs, w_out, taps)
            .transpose(0, 3, 1, 2)
            .astype(jnp.float32)
        )

    c_g = c_in // groups
    # chunk width: the widest candidate whose estimated scoped VMEM fits
    # (wider chunks = fewer grid steps and fixed costs; 256 wins ~6% e2e
    # at c4/c5 but the c3-scale or f32 scratch blows the 16 MB budget —
    # an f32 strided-c3 layer measured 19.3M at cc=128)
    xb = jnp.dtype(x.dtype).itemsize
    s_samp = taps * rbs * w_out
    # the window DMA's channel slice must be 128-aligned or the full
    # channel extent, so chunk candidates stop at 128
    cands = [c for c in (256, 128) if c_in % c == 0 and c <= c_in]
    if not cands:
        cands = [c_in]
    wp_est = _ceil_to(
        max((w_out - 1) * stride + kw + 2 * d, padding + d + w_img), 16
    )

    def fits(cand, nb):
        al = (
            groups > 1
            and (c_in // cand) > 1
            and cand % c_g == 0
            and c_out % groups == 0
        )
        if al:
            coc_c = (c_out // groups) * (cand // c_g)
            # out/weight blocks need a 128-divisible (or full) last dim
            if coc_c % 128 != 0 and coc_c != c_out:
                al = False
        if not al:
            coc_c = min(c_out, 1024)
        est = _vmem_estimate(
            cand, coc_c, s_samp, wp_est, win, rbs, w_out, taps, xb, nb
        )
        # fudge calibrated against Mosaic's measured scoped allocations:
        # every bf16 production config compiles at 2x its estimate; the
        # f32 full-scale c3 layer measured 2.3x (17.4M vs 7.6M est), so
        # f32 gets the stricter factor
        fudge = 2.5 if xb >= 4 else 2.0
        return fudge * est < 15 * 1024 * 1024

    cc = n_buf = None
    for cand in cands:
        if fits(cand, 2):
            cc, n_buf = cand, 2
            break
        if fits(cand, 1):
            cc, n_buf = cand, 1
            break
    if cc is None:
        # no feasible plan (e.g. f32 at full 800x1344 c3 scale — the
        # scratch is 2x the bf16 production footprint): the caller falls
        # back to the XLA shift path, which has identical semantics
        return None
    n_cc = c_in // cc
    import os as _os
    if _os.environ.get("BAGS_DEBUG_DCN"):
        print(
            f"dcn kernel: x={x.shape} {x.dtype} stride={stride} rb={rbs} "
            f"win={win} wp={wp} cc={cc} n_buf={n_buf} w_out={w_out}",
            flush=True,
        )
    # GROUP-ALIGNED chunk-diagonal GEMM: when the contiguous conv groups
    # tile the C_in chunks exactly (the X101 g64 layers: c_g 8/16/32 all
    # divide 128), chunk ci's input channels only ever contract against
    # their own groups' output slice — so each grid step does a
    # (pos, cc) x (cc, coc) GEMM against the LIVE diagonal block instead
    # of the full block-diagonal dense weight. This removes the
    # groups-fold MXU FLOP waste (64x -> cc/c_g-fold, 11x less at c4),
    # shrinks the weight block, and each out block is written exactly
    # once (no cross-chunk revisiting).
    aligned = groups > 1 and n_cc > 1 and cc % c_g == 0 and c_out % groups == 0
    if aligned:
        og = c_out // groups
        coc = og * (cc // c_g)
        if coc % 128 != 0 and coc != c_out:
            aligned = False  # illegal out-block tiling at this chunk width
    if aligned:
        n_co = 1
        w3 = w_dense.reshape(taps, c_in, c_out)
        w_r = jnp.stack(
            [
                jax.lax.slice(
                    w3, (0, i * cc, i * coc), (taps, (i + 1) * cc, (i + 1) * coc)
                )
                for i in range(n_cc)
            ],
            axis=0,
        ).astype(x.dtype)
    else:
        # C_out chunking keeps the weight block (taps, cc, COc) x 2
        # pipeline buffers under VMEM at c5's C_out=2048 (stage X/Y
        # recompute per chunk; n_cout is 1 everywhere C_out <= 1024)
        coc = c_out if c_out <= 1024 else 1024
        n_co = c_out // coc
        # chunk-major reorder of the dense weight: (n_cc, taps, cc, C_out)
        w_r = (
            w_dense.reshape(taps, n_cc, cc, c_out)
            .transpose(1, 0, 2, 3)
            .astype(x.dtype)
        )

    statics = dict(
        kh=kh,
        kw=kw,
        stride=stride,
        padding=padding,
        window=window,
        h=h,
        w_img=w_img,
        rb=rbs,
        w_out=w_out,
        n_rb=n_rb,
        aligned=aligned,
        n_buf=n_buf,
    )
    if mask is None:

        def kern(off_ref, xp_ref, w_ref, out_ref, wx_ref, wy_ref,
                 cols_ref, xw_ref, dma_sem):
            return _kernel(
                off_ref, xp_ref, w_ref, None, out_ref, wx_ref, wy_ref,
                cols_ref, xw_ref, dma_sem, **statics,
            )

    else:
        kern = functools.partial(_kernel, **statics)

    in_specs = [
        pl.BlockSpec(
            (1, 2 * taps, rbs, w_out), lambda t, co, c: (t, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec(
            (1, taps, cc, coc),
            (lambda t, co, c: (c, 0, 0, 0))
            if aligned
            else (lambda t, co, c: (c, 0, 0, co)),
            memory_space=pltpu.VMEM,
        ),
    ]
    args = [off_p, xp, w_r]
    if mask is not None:
        in_specs.append(
            pl.BlockSpec(
                (1, taps, rbs, w_out), lambda t, co, c: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(mask_p)

    out = pl.pallas_call(
        kern,
        grid=(b * n_rb, n_co, n_cc),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, rbs, w_out, coc),
            (lambda t, co, c: (t, 0, 0, c))
            if aligned
            else (lambda t, co, c: (t, 0, 0, co)),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b * n_rb, rbs, w_out, c_out), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((taps * rbs * w_out, wp), x.dtype),
            pltpu.VMEM((taps * rbs * w_out, win), jnp.float32),
            pltpu.VMEM((taps * rbs * w_out, cc), jnp.float32),
            pltpu.VMEM((n_buf, win, wp, cc), x.dtype),
            pltpu.SemaphoreType.DMA((n_buf,)),
        ],
        interpret=interpret,
    )(*args)
    out = out.reshape(b, n_rb * rbs, w_out, c_out)[:, :h_out]
    return out.astype(x.dtype)


def build_dense_weight(
    weight: jnp.ndarray,  # (kh, kw, C_in // groups, C_out)
    c_in: int,
    groups: int,
) -> jnp.ndarray:
    """Block-diagonal dense weight for the grouped contraction (the
    ops/deform_conv.py DENSE_GROUPS formulation — zeros in off-group
    blocks reproduce deform_conv_cuda.cpp `group` exactly)."""
    kh, kw, c_g, c_out = weight.shape
    taps = kh * kw
    if groups == 1:
        return weight.reshape(taps * c_in, c_out)
    og = c_out // groups
    w3 = weight.reshape(taps, c_g, c_out)
    gmask = jnp.repeat(jnp.eye(groups, dtype=weight.dtype), og, axis=1)
    return (w3[:, None, :, :] * gmask[None, :, None, :]).reshape(
        taps * c_in, c_out
    )


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8)
)
def deform_conv2d_fused(
    x, offsets, weight, mask, stride, padding, groups, window, interpret
):
    """Batched fused deformable conv: Pallas forward, dense XLA backward.

    Semantics = ops/deform_conv.py deform_conv2d(shift_window=window):
    the bilinear gather evaluated at clip(offsets, +-window) cells.
    """
    kh, kw = weight.shape[0], weight.shape[1]
    c_in = x.shape[-1]
    w_dense = build_dense_weight(weight, c_in, groups)
    out = _fused_forward(
        x, offsets, w_dense, mask, kh, kw, stride, padding, window,
        interpret=interpret, groups=groups,
    )
    if out is None:  # no VMEM-feasible kernel plan — same-semantics XLA
        out = _xla_reference(
            x, offsets, weight, mask, stride, padding, groups, window
        )
    return out


def _xla_reference(x, offsets, weight, mask, stride, padding, groups, window):
    from ..ops.deform_conv import deform_conv2d

    def one(xi, oi, mi):
        return deform_conv2d(
            xi, oi, weight, mi, stride, padding, groups, window
        )

    if mask is None:
        return jax.vmap(lambda xi, oi: one(xi, oi, None))(x, offsets)
    return jax.vmap(one)(x, offsets, mask)


def _fused_fwd(x, offsets, weight, mask, stride, padding, groups, window,
               interpret):
    out = deform_conv2d_fused(
        x, offsets, weight, mask, stride, padding, groups, window, interpret
    )
    return out, (x, offsets, weight, mask)


def _fused_bwd(stride, padding, groups, window, interpret, res, g):
    x, offsets, weight, mask = res
    diff_args = (0, 1, 2) if mask is None else (0, 1, 2, 3)

    def f(*args):
        if mask is None:
            xx, oo, ww = args
            mm = None
        else:
            xx, oo, ww, mm = args
        return _xla_reference(xx, oo, ww, mm, stride, padding, groups, window)

    primals = (x, offsets, weight) if mask is None else (x, offsets, weight, mask)
    _, vjp = jax.vjp(f, *primals)
    grads = vjp(g.astype(x.dtype))
    if mask is None:
        return grads + (None,)
    return grads


deform_conv2d_fused.defvjp(_fused_fwd, _fused_bwd)
