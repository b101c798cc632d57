"""Model zoo: canonical configurations mirroring the reference config families.

Reference: /root/reference/configs/ — baselines/, bags/, transferred/,
ablations/ (45 python-module configs, README.md:133-137). Here each family is
a constructor returning (DetectorConfig, TrainConfig); the full sweep of
ablation knobs (bin counts, bg ratio, selectp scope) are arguments.
"""

from __future__ import annotations

from typing import Optional, Tuple

from .config import (
    BackboneConfig,
    BBoxHeadConfig,
    CascadeConfig,
    DetectorConfig,
    GSConfig,
    HTCConfig,
    MaskHeadConfig,
    TrainConfig,
    VariantConfig,
)


def faster_rcnn_r50_fpn_lvis(
    num_classes: int = 1231,
    image_size: Tuple[int, int] = (800, 1344),
) -> Tuple[DetectorConfig, TrainConfig]:
    """configs/baselines/faster_rcnn_r50_fpn_1x_lvis.py equivalent."""
    det = DetectorConfig(
        bbox_head=BBoxHeadConfig(num_classes=num_classes),
        image_size=image_size,
    )
    return det, TrainConfig()


def gs_faster_rcnn_r50_fpn_lvis(
    num_classes: int = 1231,
    image_size: Tuple[int, int] = (800, 1344),
    num_bins: int = 5,
    others_sample_ratio: float = 8.0,
    partition_path: Optional[str] = None,
) -> Tuple[DetectorConfig, TrainConfig]:
    """configs/bags/gs_faster_rcnn_r50_fpn_1x_lvis_with0_bg8.py equivalent.

    Phase-2 recipe: selectp=1 (only fc_cls trains) warm-started from the
    baseline checkpoint (bg8.py:193,198).
    """
    det = DetectorConfig(
        bbox_head=BBoxHeadConfig(
            num_classes=num_classes,
            use_gs=True,
            gs=GSConfig(
                num_bins=num_bins,
                others_sample_ratio=others_sample_ratio,
                partition_path=partition_path,
            ),
        ),
        image_size=image_size,
    )
    return det, TrainConfig(selectp=1)


def mask_rcnn_r50_fpn_lvis(
    num_classes: int = 1231,
    use_gs: bool = False,
    partition_path: Optional[str] = None,
) -> Tuple[DetectorConfig, TrainConfig]:
    """configs/baselines/mask_rcnn_r50_fpn_1x_lvis.py /
    configs/bags/gs_mask_rcnn_r50_fpn_1x_lvis_with0_bg8.py equivalents."""
    det = DetectorConfig(
        bbox_head=BBoxHeadConfig(
            num_classes=num_classes,
            use_gs=use_gs,
            gs=GSConfig(partition_path=partition_path),
        ),
        mask_head=MaskHeadConfig(num_classes=num_classes),
    )
    return det, TrainConfig(selectp=1 if use_gs else 0)


def faster_rcnn_x101_64x4d_fpn_lvis(num_classes: int = 1231):
    """X101-64x4d backbone variant (configs/bags/gs_faster_rcnn_x101...)."""
    det = DetectorConfig(
        backbone=BackboneConfig(depth=101, groups=64, base_width=4),
        bbox_head=BBoxHeadConfig(num_classes=num_classes),
    )
    return det, TrainConfig()


def cascade_rcnn_x101_64x4d_fpn_lvis(
    num_classes: int = 1231, use_gs: bool = False, partition_path: Optional[str] = None
) -> Tuple[DetectorConfig, TrainConfig]:
    """configs/bags/gs_cascade_rcnn_x101_64x4d_fpn_1x_lvis.py equivalent
    (selectp=3: every stage's fc_cls trains in phase 2)."""
    det = DetectorConfig(
        backbone=BackboneConfig(depth=101, groups=64, base_width=4),
        bbox_head=BBoxHeadConfig(
            num_classes=num_classes,
            use_gs=use_gs,
            gs=GSConfig(partition_path=partition_path),
        ),
        cascade=CascadeConfig(),
    )
    return det, TrainConfig(selectp=3 if use_gs else 0)


def cascade_rcnn_r50_fpn_lvis(
    num_classes: int = 1231, use_gs: bool = False, partition_path: Optional[str] = None
) -> Tuple[DetectorConfig, TrainConfig]:
    """configs/cascade_rcnn_r50_fpn_1x.py equivalent, on the LVIS class
    set (the reference ships the R50 cascade alongside the X101 BAGS
    variant); also the CPU-testable cascade for the e2e suite."""
    det = DetectorConfig(
        backbone=BackboneConfig(depth=50),
        bbox_head=BBoxHeadConfig(
            num_classes=num_classes,
            use_gs=use_gs,
            gs=GSConfig(partition_path=partition_path),
        ),
        cascade=CascadeConfig(),
    )
    return det, TrainConfig(selectp=3 if use_gs else 0)


def htc_x101_64x4d_fpn_lvis(
    num_classes: int = 1231,
    use_gs: bool = False,
    partition_path: Optional[str] = None,
    dcn: bool = False,
    dcn_shift_window: int = 4,
) -> Tuple[DetectorConfig, TrainConfig]:
    """configs/bags/gs_htc_x101_64x4d_fpn_20e_16gpu_lvis.py equivalent;
    dcn=True adds deformable conv c3-c5 (gs_htc_dconv_* top-line model).
    dcn_shift_window selects the fused-kernel deform conv with offsets
    clamped to +-window cells (default 4 — the Pallas forward runs each
    DCN layer at its plain-conv floor, BENCHMARKS round 5; pass 0 for
    the exact-everywhere bilinear gather)."""
    det = DetectorConfig(
        backbone=BackboneConfig(
            depth=101,
            groups=64,
            base_width=4,
            # stage_with_dcn=(False, True, True, True) — c3-c5
            # (gs_htc_dconv_c3-c5_mstrain_400_1400_x101_64x4d_fpn_20e_lvis.py:22)
            dcn_stages=(False, True, True, True) if dcn else (False,) * 4,
            dcn_shift_window=dcn_shift_window if dcn else 0,
        ),
        bbox_head=BBoxHeadConfig(
            num_classes=num_classes,
            use_gs=use_gs,
            gs=GSConfig(partition_path=partition_path),
        ),
        mask_head=MaskHeadConfig(num_classes=num_classes),
        cascade=CascadeConfig(),
        htc=HTCConfig(),
    )
    return det, TrainConfig(selectp=3 if use_gs else 0, total_epochs=20)


def faster_rcnn_r50_fpn_rfs_lvis(num_classes: int = 1231):
    """transferred/faster_rcnn_r50_fpn_1x_lvis_rfs.py: same model; enable
    repeat-factor sampling in the data pipeline (tools/train.py --use-rfs)."""
    return faster_rcnn_r50_fpn_lvis(num_classes)


def faster_rcnn_r50_fpn_focal_lvis(num_classes: int = 1231, cls_only: bool = True):
    """transferred/faster_rcnn_r50_fpn_1x_lvis_focalloss*.py equivalents."""
    det = DetectorConfig(
        bbox_head=BBoxHeadConfig(num_classes=num_classes, loss_cls_type="focal"),
    )
    return det, TrainConfig(selectp=1 if cls_only else 0)


def faster_rcnn_r50_fpn_reweight_lvis(
    num_classes: int = 1231, class_weights_path: Optional[str] = None, cls_only: bool = True
):
    """transferred/faster_rcnn_r50_fpn_1x_lvis_reweight*.py equivalents
    (ReweightBBoxHead + cls_weight file -> gs/partition.py
    class_weights_from_counts)."""
    det = DetectorConfig(
        bbox_head=BBoxHeadConfig(
            num_classes=num_classes,
            loss_cls_type="reweight",
            class_weights_path=class_weights_path,
        ),
    )
    return det, TrainConfig(selectp=1 if cls_only else 0)


# --- detector-assembly variants (models/variants.py) ---------------------
# Carried mmdet detectors the reference ships but no LVIS config uses
# (mmdet/models/detectors/__init__.py); defaults follow their COCO-style
# configs (81 classes) with num_classes overridable for LVIS transfer.


def fast_rcnn_r50_fpn(
    num_classes: int = 81, image_size: Tuple[int, int] = (800, 1344)
) -> Tuple[DetectorConfig, TrainConfig]:
    """mmdet fast_rcnn_r50_fpn: proposal-input detector (no RPN),
    detectors/fast_rcnn.py."""
    det = DetectorConfig(
        bbox_head=BBoxHeadConfig(num_classes=num_classes),
        variant=VariantConfig(kind="fast"),
        image_size=image_size,
    )
    return det, TrainConfig()


def grid_rcnn_r50_fpn(
    num_classes: int = 81, image_size: Tuple[int, int] = (800, 1344)
) -> Tuple[DetectorConfig, TrainConfig]:
    """mmdet grid_rcnn_gn_head_r50_fpn: grid-point localization,
    detectors/grid_rcnn.py."""
    det = DetectorConfig(
        bbox_head=BBoxHeadConfig(num_classes=num_classes),
        variant=VariantConfig(kind="grid"),
        image_size=image_size,
    )
    return det, TrainConfig()


def mask_scoring_rcnn_r50_fpn(
    num_classes: int = 81, image_size: Tuple[int, int] = (800, 1344)
) -> Tuple[DetectorConfig, TrainConfig]:
    """mmdet ms_rcnn_r50_fpn: Mask R-CNN + MaskIoU rescoring,
    detectors/mask_scoring_rcnn.py."""
    det = DetectorConfig(
        bbox_head=BBoxHeadConfig(num_classes=num_classes),
        mask_head=MaskHeadConfig(num_classes=num_classes),
        variant=VariantConfig(kind="mask_scoring"),
        image_size=image_size,
    )
    return det, TrainConfig()


def double_head_rcnn_r50_fpn(
    num_classes: int = 81,
    reg_roi_scale_factor: float = 1.3,
    image_size: Tuple[int, int] = (800, 1344),
) -> Tuple[DetectorConfig, TrainConfig]:
    """mmdet dh_faster_rcnn_r50_fpn: double conv/fc bbox head with an
    inflated-roi regression branch, detectors/double_head_rcnn.py."""
    det = DetectorConfig(
        bbox_head=BBoxHeadConfig(num_classes=num_classes),
        variant=VariantConfig(
            kind="double_head", reg_roi_scale_factor=reg_roi_scale_factor
        ),
        image_size=image_size,
    )
    return det, TrainConfig()
