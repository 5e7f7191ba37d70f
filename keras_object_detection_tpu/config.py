"""Typed configuration layer (net-new component; the reference keeps
hyperparameters as module-level constants, ref train.py:49-57, yolo_v1.py:741-746).

One dataclass tree covers the five BASELINE.json configs:
  1. yolov1-tiny 224x224 CPU-runnable end-to-end
  2. yolov1 full 448x448 Darknet backbone
  3. batched eval (decode+NMS+mAP)
  4. data-parallel v5e-8 training
  5. int8 export + latency bench
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class GridConfig:
    """YOLO grid geometry: S (split size), B (boxes/cell), C (classes)."""

    grid: int = 7
    num_boxes: int = 2
    num_classes: int = 20
    # Anchor priors (w, h) in image ratios for the anchor head
    # (ModelConfig.head="anchor", the YOLOv2 family, arXiv:1612.08242 §2;
    # beyond parity — the reference is anchor-free YOLOv1 only). Fit them
    # to a dataset with tools/kmeans_anchors.py. Ignored by the v1 heads.
    anchors: Tuple[Tuple[float, float], ...] = ()

    @property
    def cell_depth(self) -> int:
        return self.num_classes + 5 * self.num_boxes

    @property
    def output_shape(self) -> Tuple[int, int, int]:
        return (self.grid, self.grid, self.cell_depth)

    def head_depth(self, head: str) -> int:
        """Last-axis depth the model emits for a head family: the v1
        layout C + 5B, or B_anchors * (5 + C) for the anchor head."""
        if head == "anchor":
            if not self.anchors:
                raise ValueError(
                    "head='anchor' requires GridConfig.anchors (fit with "
                    "tools/kmeans_anchors.py)")
            return len(self.anchors) * (5 + self.num_classes)
        if head == "fpn":
            raise ValueError(
                "head='fpn' emits one grid per scale; there is no single "
                "output depth (see core/fpn.py partition_anchors)")
        return self.cell_depth


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    # darknet24 | darknet19 (YOLOv2's backbone — pair with head="anchor",
    # passthrough=True, activation="leaky_relu" for the paper-faithful
    # YOLOv2) | darknet_tiny | darknet_micro | vgg16 | mobilenetv2
    backbone: str = "darknet24"
    # conv | gap_dense | flatten_dense | anchor (YOLOv2 family,
    # core/anchors.py) | fpn (YOLOv3-style multi-scale anchor family,
    # core/fpn.py — predicts on (S, 2S, 4S) grids with anchors split by
    # area across the scales; GridConfig.grid is the COARSEST grid)
    head: str = "conv"
    image_size: int = 448
    # bfloat16 activations keep the MXU fed at full rate; params stay f32.
    compute_dtype: str = "bfloat16"
    head_dense_units: int = 4960  # ref model.py:100
    head_batchnorm: bool = True  # False = test_model's plain head (ref model.py:164-167)
    activation: str = "relu"  # "leaky_relu" = the paper's LeakyReLU(0.1) (ref model.py:62)
    # BatchNorm batch-stats implementation (all checkpoint-compatible):
    # "flax" = stock nn.BatchNorm — the measured-fastest train step (48.5
    # ms/step flagship); "fused" = Pallas single-pass kernels
    # (ops/pallas_bn.py; 61.3 ms — pallas_call fusion barriers cost more than
    # the kernels save); "mxu" = reductions as dot-products (ops/mxu_bn.py;
    # 55.9 ms — XLA canonicalizes the dots back into reduces). Both custom
    # paths are kept as documented negative results (see ROADMAP.md).
    # "flax@N" = stock normalize with batch statistics over only the first N
    # images (ghost-batch subsample — a bandwidth experiment, models/layers.py
    # SubsetStatsBatchNorm).
    bn_mode: str = "flax"
    dropout_rate: float = 0.5
    remat: bool = False  # rematerialize backbone activations (bigger batches)
    # "full" = recompute everything in backward (max memory savings);
    # "dots" = save conv/matmul outputs, recompute only elementwise chains
    # (BN normalize / ReLU / pool) — cheaper recompute, less HBM saved.
    remat_policy: str = "full"
    # Path to pretrained backbone weights, converted at init: a Keras .h5
    # (full model or weights) for vgg16/mobilenetv2, or an original darknet
    # .weights/.conv.NN file for darknet backbones
    # (models/pretrained.py + models/darknet_import.py; ref model.py:178
    # weights='imagenet'); "" = random init (ref uses weights=None for MNv2).
    pretrained_backbone: str = ""
    # Train with the backbone frozen (ref yolo_v1.py:819-820 trainable knob);
    # implemented as stop_gradient on the backbone subtree, so XLA prunes the
    # backbone backward pass entirely.
    freeze_backbone: bool = False
    # YOLOv2 passthrough/reorg skip (arXiv:1612.08242 §2; net-new — no
    # reference counterpart): feed the 2x-resolution backbone tap into the
    # anchor head via a 1x1 reduce + space_to_depth. head="anchor" with a
    # darknet backbone only; changes the head architecture (checkpoints not
    # interchangeable with passthrough off).
    passthrough: bool = False
    # Scale count for head="fpn" (YOLOv3 uses 3: stride 32/16/8 grids).
    # len(GridConfig.anchors) must divide evenly across the scales.
    fpn_scales: int = 3

    @property
    def input_shape(self) -> Tuple[int, int, int]:
        return (self.image_size, self.image_size, 3)


@dataclasses.dataclass(frozen=True)
class DataConfig:
    train_dir: str = ""
    val_dir: str = ""
    test_dir: str = ""
    batch_size: int = 64
    shuffle: bool = True
    drop_remainder: bool = True
    # Augmentation knobs mirror the reference Albumentations policy
    # (ref dataset.py:136-146): flip 0.5, ColorJitter defaults,
    # RandomResizedCrop scale (0.8, 1.0), min bbox visibility 0.1.
    hflip_prob: float = 0.5
    color_jitter: Tuple[float, float, float, float] = (0.2, 0.2, 0.2, 0.2)
    crop_scale: Tuple[float, float] = (0.8, 1.0)
    crop_ratio: Tuple[float, float] = (0.75, 1.3333333333333333)
    min_visibility: float = 0.1
    # Aspect-preserving letterbox input (beyond parity — the reference's
    # square resize distorts aspect, ref dataset.py:143-146): resize keeping
    # aspect + centered gray padding, boxes remapped consistently for train,
    # eval, and serving (unletterbox_detections maps detections back to
    # original-photo ratios).
    letterbox: bool = False
    # Mosaic augmentation (beyond parity; YOLOv4 arXiv:2004.10934): per-image
    # probability of composing the training image from 4 batch images resized
    # into the quadrants of a random center point. Runs on-device BEFORE the
    # reference flip/jitter/crop policy; the per-image box budget becomes
    # 4 * max_boxes_per_image inside the step. 0.0 disables (bit-identical
    # canonical path).
    mosaic_prob: float = 0.0
    # Uniform range the mosaic center is drawn from (relative units).
    mosaic_center_range: Tuple[float, float] = (0.25, 0.75)
    # Detection mixup (beyond parity; arXiv:1902.04103 §3.1): per-image
    # probability of blending with a permutation partner (λ ~ Beta(alpha,
    # alpha) folded into [0.5, 1]) keeping the box UNION. Composes with
    # mosaic (applied after it, before the reference flip/jitter/crop); the
    # per-image box budget doubles inside the step. 0.0 disables.
    mixup_prob: float = 0.0
    mixup_alpha: float = 1.5
    max_boxes_per_image: int = 64  # static padding bound for on-device encode
    prefetch: int = 2
    num_workers: int = 8
    # Keep decoded uint8 images in host RAM after epoch 1 (augmentation is
    # on-device, so the host work is identical every epoch). ~600 KB/image
    # at 448x448.
    cache_in_memory: bool = False
    # Decode-ahead DISK cache dir for datasets too big for RAM: images are
    # decoded once into a uint8 memmap (data/disk_cache.py), epochs read raw
    # bytes. "" disables. A per-split subdir is derived automatically.
    cache_dir: str = ""
    # Keep the ENTIRE dataset resident in device HBM and gather batches
    # on-device by index (data/pipeline.py DeviceCachedDataset): one upload,
    # then only a (batch,) index vector per step. For datasets that fit in
    # HBM; removes the per-step host->device image transfer (the relay
    # bottleneck/leak — see the class docstring).
    device_cache: bool = False
    # HBM layout of the cache on a multi-device mesh:
    #   "replicated" — every device holds the full dataset; the per-step
    #     gather is local (no collectives). Per-device memory = dataset size.
    #   "sharded"    — rows are sharded over the data axis; each device
    #     gathers its shard's contributions and one reduce-scatter
    #     (lax.psum_scatter over ICI) assembles the batch, already sharded
    #     on the data axis. Per-device memory = dataset / data_parallel, so
    #     VOC-scale 448 sets (~13 GB) fit an 8-chip mesh. Bit-identical
    #     batches to both other paths (same shared shuffle stream).
    device_cache_layout: str = "replicated"
    # Host decode/cache resolution for TRAIN images (crop fidelity). None =
    # the model image_size (status-quo parity: crops of an already-resized
    # image can be up to ~12% linearly upsampled). Set ABOVE image_size —
    # e.g. ceil(448/sqrt(0.8)) = 501 for the flagship — and the on-device
    # RandomResizedCrop samples at or above target resolution, like
    # Albumentations cropping the original image then resizing once (ref
    # dataset.py:139). Eval datasets always decode at image_size.
    # Measured A/B (benchmarks/crop_fidelity_ab.json): on 560²-source
    # SYNTHETIC data the 501-decode arm is -0.11 mAP — the faithful crop is
    # a strictly stronger augmentation with no photographic detail to pay it
    # back; keep None there, re-evaluate on real photo datasets.
    train_decode_size: Optional[int] = None

    def train_input_size(self, image_size: int) -> int:
        """Resolution train datasets must be decoded/cached at."""
        if self.train_decode_size is not None:
            if self.train_decode_size < image_size:
                raise ValueError(
                    f"train_decode_size {self.train_decode_size} < model "
                    f"image_size {image_size}")
            return self.train_decode_size
        return image_size


@dataclasses.dataclass(frozen=True)
class ScheduleConfig:
    kind: str = "piecewise_warmup"  # piecewise_warmup | cosine_restarts | constant
    base_lr: float = 1e-3
    # piecewise warmup (ref train.py:126-135)
    warmup_epochs: int = 75
    mid_epochs: int = 105
    warmup_target: float = 0.01
    mid_lr: float = 1e-3
    final_lr: float = 1e-4
    # cosine-annealing with warm restarts (ref cosine_annealing.py:6-47)
    eta_min: float = 0.0
    t_max: int = 10
    t_mult: int = 2
    decay: float = 1.0


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    epochs: int = 1000
    optimizer: str = "nadam"  # ref train.py:114; monolith uses adam (yolo_v1.py)
    schedule: ScheduleConfig = dataclasses.field(default_factory=ScheduleConfig)
    checkpoint_dir: str = "checkpoints"
    log_dir: str = "logs"
    map_eval_start_epoch: int = 100  # ref train.py:192 gate
    map_eval_every: int = 10
    # Minimum epochs between best-checkpoint saves (0 = save on every
    # improvement, the reference's ModelCheckpoint semantics). Each save
    # device_gets the full train state (~730 MB for the flagship — ~10 s
    # through the relay), so early training where val_loss improves every
    # epoch can become save-bound; a cooldown bounds that overhead. The
    # final epoch is always saved.
    save_cooldown_epochs: int = 0
    seed: int = 0
    lambda_coord: float = 5.0
    lambda_noobj: float = 0.5
    # "selected" = reference parity (ref loss.py:197); "all" = the YOLOv1
    # paper's no-object term over every box slot (trains the second slot).
    noobj_mode: str = "selected"
    # Use the fused Pallas loss kernel (ops/pallas_loss.py) instead of the
    # jnp formulation — bit-equivalent values/grads (see tests); TPU only.
    use_pallas_loss: bool = False
    # "mse" = reference parity; opt-in IoU-family box regression (PAPERS.md):
    # "diou" (Distance-IoU, Zheng et al. 2019), "ciou" (+ aspect-ratio
    # consistency, same paper), "alpha_iou" (alpha-DIoU, He et al. 2021).
    box_loss_mode: str = "mse"
    # Anchor/fpn families only (beyond parity): darknet's no-object ignore
    # mask — unassigned slots whose decoded prediction overlaps any GT above
    # this IoU are exempted from the no-object term (v2 uses 0.6, v3 0.5).
    # None = off (every unassigned slot penalized, the framework default).
    ignore_threshold: Optional[float] = None
    # Anchor/fpn families only: assigned-slot confidence target. "one" =
    # constant 1 (the v1-parity convention, default); "iou" = darknet v2/v3's
    # live exact IoU between the decoded prediction and its GT (stop-grad).
    obj_target: str = "one"
    # Multi-scale training (YOLOv2-style, beyond parity): train epochs at
    # randomly chosen input resolutions from this tuple; () disables. Each
    # size is one cached XLA compile (static shapes); the conv head's target
    # grid scales with the resolution (S = feature size), the fully-
    # convolutional params are shared, and validation/serving stay at
    # ModelConfig.image_size. Sizes must be multiples of the backbone's
    # pixel stride (image_size // grid.grid for the darknet family, e.g. 64
    # for darknet24@448). Requires head "conv" (grid follows resolution) or
    # "gap_dense" (grid fixed by the head); flatten_dense heads have
    # resolution-dependent parameter shapes and are rejected. Note the
    # reference's sum-reduced loss scales with cell count, so larger sizes
    # contribute proportionally larger loss values — same-sign gradients,
    # standard for this family.
    multiscale_sizes: tuple = ()
    # Re-draw the multiscale size every N epochs (YOLOv2 re-draws every 10
    # batches; per-epoch keeps one compiled program per epoch).
    multiscale_every: int = 1
    # Decoupled weight decay for the "adamw"/"sgdw" optimizers (beyond
    # parity; arXiv:1711.05101). Ignored by the reference optimizers
    # (adam/nadam/sgd), which never regularize (ref train.py:114).
    weight_decay: float = 1e-4
    # Gradient accumulation: split each batch into N microbatches inside the
    # ONE jitted step (lax.scan), summing gradients before a single optimizer
    # update. The loss is sum-reduced (reference semantics), so N microbatch
    # gradients sum to the full-batch gradient exactly — the only semantic
    # difference is BatchNorm batch statistics, computed per microbatch
    # (standard for accumulation everywhere). Peak activation memory drops
    # ~N-fold: raise DataConfig.batch_size for a larger effective batch at
    # fixed HBM. Microbatches are strided slices (i::N) so a data-parallel
    # mesh stays load-balanced; batch_size must be divisible by
    # N * data_parallel. 1 disables (bit-identical to the canonical step).
    grad_accum_steps: int = 1
    # Maintain an exponential moving average of the params (evaluated /
    # served via TrainState.ema_params); None disables.
    ema_decay: Optional[float] = None
    # When EMA is on, run validation/eval with the averaged params.
    eval_with_ema: bool = True
    # Train steps executed per host dispatch when the dataset is
    # device_cache-resident: K > 1 runs K steps in ONE jitted call via
    # lax.scan over the epoch's batch-index rows (RNG folds in state.step
    # inside the step, so the stream and batch order are identical to the
    # per-step path; the scan body may fuse differently, giving the same
    # float-drift class as DP-vs-single-device); -1 scans the WHOLE epoch
    # in one dispatch. Removes the per-step host dispatch/relay round trip,
    # which dominates the gap between end-to-end epoch throughput and the
    # device step rate on relay-attached chips. 1 = per-step dispatch
    # (default). Validation is chunked the same way (loss-only scan every
    # epoch; the rarer mAP epochs re-run the per-step pass with the
    # accumulator inline — same forwards, same values). Requires
    # DataConfig.device_cache.
    steps_per_dispatch: int = 1


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh axes. YOLOv1 only needs data parallelism, but the axes are
    declared so a model axis can be added without an API break (SURVEY.md §2.2)."""

    data_axis: str = "data"
    model_axis: str = "model"
    data_parallel: int = -1  # -1 = all devices
    model_parallel: int = 1


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    conf_threshold: float = 0.4  # ref utils.py:80
    iou_threshold: float = 0.5
    map_iou_threshold: float = 0.5
    # Confidence-ranked candidate compaction bound (ops/nms.py
    # top_k_candidates): candidate sets larger than this are compacted to
    # the top-K by confidence before NMS and before the mAP matcher. Exact
    # whenever the above-threshold candidates fit in K (the conf>0.4 filter
    # guarantees this in practice); a NO-OP for every parity surface (the
    # v1/anchor heads emit <= 245 candidates). What it bounds: the (N, N)
    # NMS matrices, the mAP matcher's (I, D, G) IoU volume, and the Pallas
    # NMS kernel's VMEM budget (PALLAS_NMS_MAX_N=512) — required for the
    # FPN family's 10,647-candidate decode at 416². 0 disables.
    max_candidates: int = 512
    # Serving-path NMS flavor. "hard" = the reference's greedy suppression
    # (ref utils.py:79-149, bit-parity default). "soft_gaussian"/"soft_linear"
    # = class-aware Soft-NMS (ops/nms.py soft_non_max_suppression): overlaps
    # get confidence-decayed instead of deleted. "fast" = one-shot matrix
    # NMS (YOLACT arXiv:1904.02689 §3.5, ops/nms.py fast_non_max_suppression):
    # no sequential suppression chain — one (N, N) reduction instead of the
    # N-iteration greedy loop, at the cost of slight over-suppression (kept
    # set is a subset of greedy's). Both opt-in, beyond parity. Applies to
    # InferenceModel serving only; the mAP accumulator keeps the reference's
    # hard NMS for metric parity.
    nms_mode: str = "hard"
    soft_nms_sigma: float = 0.5  # gaussian decay scale
    # Opt-in de-biasing of non-divisible eval sets: weight out the zero-padded
    # images of the final partial batch from val loss and drop them from the
    # mAP accumulator. False = reference parity in spirit (the reference
    # shrinks the last batch, ref dataset.py:38-47; our static-shape pipeline
    # pads it, so padded images otherwise add phantom no-object loss terms
    # and spurious detections).
    mask_padded_images: bool = False
    # Test-time augmentation for the serving path (InferenceModel /
    # evaluate.py --tta). "none" = reference parity. "hflip" = forward the
    # image AND its mirror in the same jit program, un-flip the mirrored
    # detections, and let NMS merge the union (2*S*S candidates) —
    # the standard detection TTA; ~2x forward FLOPs per call.
    tta: str = "none"
    # Opt-in: on every mAP epoch, additionally log the COCO-style
    # mAP@[.50:.95] sweep (val_mAP_coco + per-threshold keys). Rides the
    # already-accumulated decode+NMS box sets — one extra compiled matcher
    # sweep, zero extra forward passes. Off = reference parity (the
    # reference only ever computes VOC mAP@0.5).
    coco_map: bool = False


@dataclasses.dataclass(frozen=True)
class Config:
    grid: GridConfig = dataclasses.field(default_factory=GridConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    eval: EvalConfig = dataclasses.field(default_factory=EvalConfig)

    def to_json(self) -> str:
        import json

        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "Config":
        import json

        import typing

        d = json.loads(text)

        def build(tp, section):
            # get_type_hints resolves the stringified annotations that
            # `from __future__ import annotations` produces, so nested
            # dataclass fields are detected structurally (any future nested
            # config section works without a name special-case).
            hints = typing.get_type_hints(tp)
            fields = {f.name: f for f in dataclasses.fields(tp)}
            kwargs = {}
            for k, v in section.items():
                if k not in fields:
                    continue
                ftype = hints[k]
                if dataclasses.is_dataclass(ftype) and isinstance(v, dict):
                    kwargs[k] = build(ftype, v)
                elif isinstance(v, list):
                    kwargs[k] = tuple(v)
                else:
                    kwargs[k] = v
            return tp(**kwargs)

        return cls(
            grid=build(GridConfig, d.get("grid", {})),
            model=build(ModelConfig, d.get("model", {})),
            data=build(DataConfig, d.get("data", {})),
            train=build(TrainConfig, d.get("train", {})),
            mesh=build(MeshConfig, d.get("mesh", {})),
            eval=build(EvalConfig, d.get("eval", {})),
        )


def tiny_cpu_config(data_dir: str = "") -> Config:
    """BASELINE config 1: CPU-runnable tiny model on the 3-class fixture."""
    return Config(
        grid=GridConfig(grid=7, num_boxes=2, num_classes=3),
        model=ModelConfig(backbone="darknet_tiny", head="conv", image_size=224,
                          compute_dtype="float32"),
        data=DataConfig(train_dir=data_dir, val_dir=data_dir, test_dir=data_dir,
                        batch_size=2, drop_remainder=False),
        train=TrainConfig(epochs=5, optimizer="adam",
                          schedule=ScheduleConfig(kind="constant", base_lr=1e-3)),
    )


def test_model_config() -> Config:
    """The reference's ``test_model`` variant (ref model.py:153-169):
    MobileNetV2 + GAP + plain Dense(4096)/ReLU head, grid-reshaped output."""
    return Config(
        grid=GridConfig(grid=7, num_boxes=2, num_classes=20),
        model=ModelConfig(backbone="mobilenetv2", head="gap_dense",
                          image_size=448, head_dense_units=4096,
                          head_batchnorm=False),
    )


# The YOLOv3 416-model's 9 anchors (arXiv:1804.02767 §2.3, pixel units of
# the 416 input), expressed as image ratios — partitioned by area across the
# 3 scales by core/fpn.partition_anchors.
YOLOV3_ANCHORS_416 = tuple(
    (w / 416.0, h / 416.0)
    for (w, h) in ((10, 13), (16, 30), (33, 23), (30, 61), (62, 45),
                   (59, 119), (116, 90), (156, 198), (373, 326)))


def yolov3_config(train_dir: str = "", val_dir: str = "",
                  test_dir: str = "", num_classes: int = 20) -> Config:
    """The paper-faithful YOLOv3 assembly (arXiv:1804.02767; net-new — the
    reference repo is YOLOv1-only): Darknet-53 + 3-scale FPN head at 416²
    (grids 13/26/52), the paper's 9 dimension-cluster anchors, LeakyReLU.
    Refit anchors to your dataset with tools/kmeans_anchors.py (9 priors)."""
    return Config(
        grid=GridConfig(grid=13, num_boxes=2, num_classes=num_classes,
                        anchors=YOLOV3_ANCHORS_416),
        model=ModelConfig(backbone="darknet53", head="fpn", fpn_scales=3,
                          image_size=416, activation="leaky_relu"),
        data=DataConfig(train_dir=train_dir, val_dir=val_dir,
                        test_dir=test_dir, batch_size=32),
        train=TrainConfig(optimizer="adam", ignore_threshold=0.5,
                          obj_target="iou"),
    )


def voc_full_config(train_dir: str = "", val_dir: str = "", test_dir: str = "") -> Config:
    """BASELINE config 2: full 448x448 Darknet-24 on VOC (S=7, B=2, C=20)."""
    return Config(
        grid=GridConfig(grid=7, num_boxes=2, num_classes=20),
        model=ModelConfig(backbone="darknet24", head="conv", image_size=448),
        data=DataConfig(train_dir=train_dir, val_dir=val_dir, test_dir=test_dir,
                        batch_size=64),
        train=TrainConfig(epochs=1000, optimizer="nadam"),
    )
