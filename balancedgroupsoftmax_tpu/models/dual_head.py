"""Dual-head tail-class score override (the reference's dormant test path).

Parity: /root/reference/mmdet/models/detectors/two_stage.py:43-51 +
test_mixins.py:70-136 (`simple_test_bboxes_reweight` /
`update_scores_with_reweight`): when `test_cfg.test_mode` is set, a second
bbox head (`bbox_head_back`, e.g. trained with reweighting) re-scores the
proposals, and for tail classes (a mask of class ids, the reference's
`mask.pt`) the main head's scores are replaced by the second head's. No
shipped reference config enables it; provided here for capability parity.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def tail_class_mask_from_counts(
    instance_counts: np.ndarray, threshold: int = 100
) -> np.ndarray:
    """(C,) bool — classes with fewer than `threshold` training instances
    (the generation rule of mask.pt, tools/lvis_analyse.py get_mask:270-285)."""
    m = np.asarray(instance_counts) < threshold
    m[0] = False  # background never overridden
    return m


def update_scores_with_reweight(
    scores_main: jnp.ndarray,  # (N, C) calibrated scores of the main head
    scores_back: jnp.ndarray,  # (N, C) scores of the reweighted second head
    tail_mask: jnp.ndarray,  # (C,) bool — classes taken from the second head
) -> jnp.ndarray:
    """Per-RoI score-row override (test_mixins.py:70-92).

    The reference replaces a RoI's ENTIRE score row with the reweighted
    head's row iff (a) the main head's argmax is not background and (b) the
    reweighted head's argmax for that RoI is a tail class:

        cls_ori = scores.argmax(1)
        cls_ori[cls_ori != 0] = scores_reweight.argmax(1)[cls_ori != 0]
        scores[mask4newhead[cls_ori]] = scores_reweight[...]

    (RoIs whose main argmax IS background keep class 0, and mask[0] = 0,
    so they are never replaced.)
    """
    cls_ori = jnp.argmax(scores_main, axis=1)
    cls_back = jnp.argmax(scores_back, axis=1)
    cls_sel = jnp.where(cls_ori == 0, cls_ori, cls_back)
    replace = tail_mask.astype(bool)[cls_sel]
    return jnp.where(replace[:, None], scores_back, scores_main)
