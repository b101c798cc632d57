"""Typed configuration for the framework.

Replaces the reference's 8.6k-LoC python-module config system
(/root/reference/configs/, loaded by mmcv.Config at tools/train.py:96) with
frozen dataclasses. Field defaults reproduce the canonical BAGS config
`configs/bags/gs_faster_rcnn_r50_fpn_1x_lvis_with0_bg8.py`.

Everything here is static/hashable so configs can be closed over by jitted
functions without retracing hazards.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class AssignerConfig:
    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.5
    min_pos_iou: float = 0.5
    gt_max_assign_all: bool = True


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    num: int = 512
    pos_fraction: float = 0.25
    add_gt_as_proposals: bool = True


@dataclasses.dataclass(frozen=True)
class AnchorConfig:
    # RPN anchors (bg8.py:21-23)
    scales: Tuple[float, ...] = (8.0,)
    ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    strides: Tuple[int, ...] = (4, 8, 16, 32, 64)

    @property
    def num_base_anchors(self) -> int:
        return len(self.scales) * len(self.ratios)


@dataclasses.dataclass(frozen=True)
class RPNTrainConfig:
    assigner: AssignerConfig = AssignerConfig(
        pos_iou_thr=0.7, neg_iou_thr=0.3, min_pos_iou=0.3
    )
    sampler: SamplerConfig = SamplerConfig(
        num=256, pos_fraction=0.5, add_gt_as_proposals=False
    )
    allowed_border: int = 0
    pos_weight: float = -1.0


@dataclasses.dataclass(frozen=True)
class ProposalConfig:
    """RPN proposal generation (train: bg8.py:78-84, test: :101-107)."""

    nms_pre: int = 2000
    nms_post: int = 2000
    max_num: int = 2000
    nms_thr: float = 0.7
    min_bbox_size: float = 0.0


@dataclasses.dataclass(frozen=True)
class RCNNTrainConfig:
    assigner: AssignerConfig = AssignerConfig()
    sampler: SamplerConfig = SamplerConfig()
    pos_weight: float = -1.0


@dataclasses.dataclass(frozen=True)
class RCNNTestConfig:
    score_thr: float = 0.0
    nms_iou_thr: float = 0.5
    max_per_img: int = 300
    nms_type: str = "nms"  # or "soft_nms"
    # static capacity: candidate boxes entering per-class NMS per class
    # (>= max_per_img keeps the top-300 selection near-exact; see ops/nms.py)
    nms_candidates_per_class: int = 300


@dataclasses.dataclass(frozen=True)
class GSConfig:
    """Grouped-softmax head config (bg8.py:39-51)."""

    num_bins: int = 5
    others_sample_ratio: float = 8.0
    # paths to the offline partition files (.npz, from tools/gs_partition)
    partition_path: Optional[str] = None


@dataclasses.dataclass(frozen=True)
class BBoxHeadConfig:
    num_shared_fcs: int = 2
    in_channels: int = 256
    roi_feat_size: int = 7
    fc_out_channels: int = 1024
    num_classes: int = 1231  # 1230 fg + 1 bg
    target_means: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.0)
    target_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    reg_class_agnostic: bool = False
    use_gs: bool = False
    gs: GSConfig = GSConfig()
    # classification loss flavor: 'softmax' (default), 'focal'
    # (transferred/*focalloss*.py), 'reweight' (ReweightBBoxHead +
    # cls_weight file -> class_weights_path .npy of shape (num_classes,))
    loss_cls_type: str = "softmax"
    class_weights_path: Optional[str] = None
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25


@dataclasses.dataclass(frozen=True)
class RoIExtractorConfig:
    out_size: int = 7
    sample_num: int = 2
    out_channels: int = 256
    featmap_strides: Tuple[int, ...] = (4, 8, 16, 32)
    finest_scale: int = 56  # single_level.py:31


@dataclasses.dataclass(frozen=True)
class BackboneConfig:
    depth: int = 50
    num_stages: int = 4
    frozen_stages: int = 1
    norm_eval: bool = True
    # ResNeXt
    groups: int = 1
    base_width: int = 4
    # stages where deformable conv replaces the 3x3 (HTC-DCN)
    dcn_stages: Tuple[bool, ...] = (False, False, False, False)
    # DCN v2 (modulated). The shipped top-line config is v1:
    # gs_htc_dconv_c3-c5_*.py dcn=dict(modulated=False, groups=64)
    dcn_modulated: bool = False
    # deform-conv groups, independent of the ResNeXt groups — the reference
    # reads them from the dcn dict (resnext.py: self.dcn.get('groups', 1)).
    # None => follow `groups` (they coincide at 64 for the shipped X101).
    dcn_groups: Optional[int] = None
    # >0: gather-free shift-decomposition deform-conv im2col with offsets
    # clamped to +-dcn_shift_window cells (ops/deform_conv.py
    # _shift_window_cols — exact within the window, bounded deformation
    # range beyond); 0: the exact-everywhere bilinear gather
    dcn_shift_window: int = 0
    # rematerialize residual blocks (jax.checkpoint) — trades FLOPs for
    # activation memory, enabling larger train batches
    remat: bool = False


@dataclasses.dataclass(frozen=True)
class FPNConfig:
    in_channels: Tuple[int, ...] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5


@dataclasses.dataclass(frozen=True)
class MaskHeadConfig:
    num_convs: int = 4
    in_channels: int = 256
    conv_out_channels: int = 256
    num_classes: int = 1231
    mask_size: int = 28
    class_agnostic: bool = False


@dataclasses.dataclass(frozen=True)
class CascadeConfig:
    """Cascade R-CNN staging (configs/bags/gs_cascade_rcnn_x101...py).

    Per-stage target stds tighten and assigner IoU thresholds rise; heads
    are reg_class_agnostic (cascade config :60,86,112)."""

    num_stages: int = 3
    stage_loss_weights: Tuple[float, ...] = (1.0, 0.5, 0.25)
    stage_pos_ious: Tuple[float, ...] = (0.5, 0.6, 0.7)
    stage_target_stds: Tuple[Tuple[float, ...], ...] = (
        (0.1, 0.1, 0.2, 0.2),
        (0.05, 0.05, 0.1, 0.1),
        (0.033, 0.033, 0.067, 0.067),
    )


@dataclasses.dataclass(frozen=True)
class HTCConfig:
    """Hybrid Task Cascade extras (htc.py:13-33)."""

    semantic_num_classes: int = 183
    semantic_loss_weight: float = 0.2
    semantic_ignore_label: int = 255
    fusion_level: int = 1  # stride-8 FPN level
    semantic_fusion: Tuple[str, ...] = ("bbox", "mask")
    interleaved: bool = True
    mask_info_flow: bool = True


@dataclasses.dataclass(frozen=True)
class VariantConfig:
    """Detector-assembly variant (mmdet/models/detectors/{fast_rcnn,
    grid_rcnn,mask_scoring_rcnn,double_head_rcnn}.py). The shared
    two-stage machinery stays in models/detector.py; `kind` selects the
    wiring in models/variants.py."""

    kind: str  # 'fast' | 'grid' | 'mask_scoring' | 'double_head'
    # DoubleHeadRCNN: the reg branch pools rois inflated by this factor
    # (double_head_rcnn.py reg_roi_scale_factor; shipped configs use 1.3)
    reg_roi_scale_factor: float = 1.3
    # GridRCNN (grid_rcnn.py): heatmap resolution + positive-jitter amount
    grid_heatmap_size: int = 56
    grid_jitter: float = 0.15


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    """Full two-stage detector configuration."""

    backbone: BackboneConfig = BackboneConfig()
    fpn: FPNConfig = FPNConfig()
    anchors: AnchorConfig = AnchorConfig()
    roi_extractor: RoIExtractorConfig = RoIExtractorConfig()
    bbox_head: BBoxHeadConfig = BBoxHeadConfig()
    mask_head: Optional[MaskHeadConfig] = None
    cascade: Optional[CascadeConfig] = None
    htc: Optional[HTCConfig] = None
    variant: Optional[VariantConfig] = None
    rpn_train: RPNTrainConfig = RPNTrainConfig()
    rpn_proposal_train: ProposalConfig = ProposalConfig(
        nms_pre=2000, nms_post=2000, max_num=2000
    )
    rpn_proposal_test: ProposalConfig = ProposalConfig(
        nms_pre=1000, nms_post=1000, max_num=1000
    )
    rcnn_train: RCNNTrainConfig = RCNNTrainConfig()
    rcnn_test: RCNNTestConfig = RCNNTestConfig()
    # static input geometry: padded image bucket (H, W), divisible by 64
    image_size: Tuple[int, int] = (800, 1344)
    max_gt_boxes: int = 100


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization recipe (bg8.py:170-198)."""

    lr: float = 0.01
    momentum: float = 0.9
    weight_decay: float = 1e-4
    grad_clip_norm: float = 35.0
    warmup_iters: int = 500
    warmup_ratio: float = 1.0 / 3.0
    lr_step_epochs: Tuple[int, ...] = (8, 11)
    total_epochs: int = 12
    # selectp (tools/train.py:143-158): 0=all, 1=fc_cls only, 2=bbox head,
    # 3=cascade fc_cls, 4=bbox+mask heads
    selectp: int = 0
