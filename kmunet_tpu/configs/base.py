"""One dataclass config system replacing the reference's scattered constants.

The reference hardcodes paths/hyperparameters per script (SURVEY.md §5
"Config") and vendors two other config systems (yacs for Swin,
ml_collections for TransUNet). Here every experiment is an
``ExperimentConfig`` with dotted-path CLI overrides
(``--train.lr=3e-4 --data.img_size=128``).

Canonical recipes re-derived from the reference:
- shanghai_km_unet(): train_shanghai.py:342,372,396-401 — AdamW lr 1e-3
  wd 0.05, cosine T_max 200 eta_min 5e-4 stepped per epoch, 120 epochs,
  batch 2, HybridLoss alpha 0.7, 5-in/20-out at 256^2.
- laps_km_unet(): train_LAPS.py — 5-in/3-out, batch 1, thresholds on
  normalized values.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence


@dataclasses.dataclass
class DataConfig:
    name: str = "synthetic"           # synthetic | shanghai | laps
    path: Optional[str] = None
    img_size: int = 256
    seq_len: int = 25
    in_frames: int = 5
    out_frames: int = 20
    batch_size: int = 2               # global batch (sharded over 'data' axis)
    num_workers: int = 4
    value_scale: float = 90.0
    thresholds: Sequence[float] = (20, 30, 35, 40)
    synthetic_length: int = 64
    device_cache: bool = False        # keep the whole train/val corpus in HBM and
                                      # run each epoch as ONE jitted lax.scan —
                                      # removes per-step host dispatch (critical
                                      # over a high-latency device tunnel); only
                                      # for corpora that fit (e.g. synthetic)
    lpips_weights: Optional[str] = None  # .npz from metrics/lpips.py converters;
                                         # without it LPIPS reports "needs weights"
                                         # (reference downloads AlexNet, metrics.py:37-39)


@dataclasses.dataclass
class ModelConfig:
    name: str = "km_unet_v3"
    variant: str = "sh"               # sh | laps
    embed_dims: Sequence[int] = (16, 32, 64)
    num_classes: int = 20
    extra: dict = dataclasses.field(default_factory=dict)


@dataclasses.dataclass
class TrainConfig:
    optimizer: str = "adamw"
    lr: float = 1e-3
    weight_decay: float = 0.05
    momentum: float = 0.9             # sgd/rmsprop only
    schedule: str = "cosine_epoch"    # CosineAnnealingLR stepped per epoch
    cosine_t_max: int = 200
    eta_min: float = 5e-4
    milestones: Sequence[int] = (15000, 30000)  # MultiStepLR, epoch units
    gamma: float = 0.1                # MultiStepLR/StepLR decay factor
    plateau_factor: float = 0.1       # schedule="plateau" (ReduceLROnPlateau)
    plateau_patience: int = 10        # epochs without val improvement
    epochs: int = 120
    loss: str = "hybrid"
    loss_alpha: float = 0.7
    kan_reg_weight: float = 0.0       # spline L1+entropy regularizer weight;
                                      # 0 = off (the reference defines it but
                                      # never enables it, KANlayers.py:711)
    grad_clip: float = 0.0            # global-norm gradient clip; 0 = off
                                      # (the reference never clips — opt-in
                                      # stabilizer for recipes it never ran)
    wd_mask_norms: bool = False       # mask weight decay off 1-D params
                                      # (norm scales/biases + conv biases).
                                      # Off by default: the reference decays
                                      # every param (train_shanghai.py:342),
                                      # which is what collapses the output-
                                      # GroupNorm gamma on late horizons
                                      # (BASELINE.md round 5). Opt-in fix.
    nan_abort: bool = True            # stop the epoch loop when train/val
                                      # loss goes non-finite (params are dead;
                                      # the reference's nan_hook analogue,
                                      # train_shanghai.py:287-294)
    seed: int = 42
    log_every: int = 50
    ckpt_dir: Optional[str] = None
    compute_dtype: str = "float32"    # float32 | bfloat16 (AMP analogue)
    resume: bool = False              # restore latest checkpoint from ckpt_dir
    early_stop_patience: int = 0      # 0 = off; epochs without val improvement
    remat: bool = False               # rematerialize activations (mem << compute)
    out_dir: Optional[str] = None     # if set: vis PNGs + scatter CSV land here
    vis_batches: int = 10             # test-time PNG dumps for first N batches
                                      # (train_shanghai.py:258-268; needs out_dir)
    scatter_eval: bool = False        # LAPS/NC flattened per-threshold metrics
                                      # (train_LAPS.py:274-331)


@dataclasses.dataclass
class MeshConfig:
    data: int = -1
    spatial: int = 1
    model: int = 1
    fsdp: bool = False


@dataclasses.dataclass
class ExperimentConfig:
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)


def shanghai_km_unet() -> ExperimentConfig:
    return ExperimentConfig(
        data=DataConfig(name="shanghai", out_frames=20, batch_size=2),
        model=ModelConfig(variant="sh", num_classes=20),
        train=TrainConfig(),
    )


def laps_km_unet() -> ExperimentConfig:
    return ExperimentConfig(
        data=DataConfig(
            name="laps", seq_len=8, out_frames=3, batch_size=1,
            value_scale=1.0, thresholds=(0.1, 0.3, 0.5, 0.7, 0.8),
        ),
        model=ModelConfig(variant="laps", num_classes=3),
        train=TrainConfig(scatter_eval=True),
    )


def _set_dotted(cfg, dotted: str, raw: str):
    obj = cfg
    *path, leaf = dotted.split(".")
    for p in path:
        obj = obj[p] if isinstance(obj, dict) else getattr(obj, p)
    if isinstance(obj, dict):
        # dict leaves (e.g. --model.extra.drop_path=0.0): no existing value
        # to infer a type from — literal-eval, falling back to string.
        # Lowercase booleans coerce too: '--model.extra.head_norm=false'
        # would otherwise silently become the TRUTHY string 'false'.
        import ast

        if raw.lower() in ("true", "false"):
            obj[leaf] = raw.lower() == "true"
            return
        try:
            obj[leaf] = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            obj[leaf] = raw
        return
    current = getattr(obj, leaf)
    if isinstance(current, bool):
        value = raw.lower() in ("1", "true", "yes")
    elif isinstance(current, int):
        value = int(raw)
    elif isinstance(current, float):
        value = float(raw)
    elif isinstance(current, (tuple, list)):
        value = type(current)(type(current[0])(v) if current else float(v) for v in raw.split(","))
    else:
        value = raw
    setattr(obj, leaf, value)


def parse_overrides(cfg: ExperimentConfig, argv: Sequence[str]) -> ExperimentConfig:
    """Apply ``--a.b=value`` style overrides in place; returns cfg."""
    for arg in argv:
        if not arg.startswith("--"):
            raise ValueError(f"unrecognized argument {arg!r} (expected --path=value)")
        body = arg[2:]
        if "=" not in body:
            raise ValueError(f"override {arg!r} must be --path=value")
        dotted, raw = body.split("=", 1)
        _set_dotted(cfg, dotted, raw)
    return cfg
