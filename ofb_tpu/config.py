"""Typed configuration for ofb_tpu.

Mirrors the full knob surface of the reference CLIs
(reference search.py:28-225 `get_args_parser`, finetune.py:30-179) as typed
dataclasses instead of argparse soup.  Derived quantities (absolute lr from
base lr x eff_batch/256, reference search.py:509-527) are computed in
`resolve()`.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass
class OptimFamilyConfig:
    """One optimizer family (param / arch / decoder).

    The reference builds three AdamW optimizers with independent
    lr/eps/betas/weight-decay (reference search.py:529-559).
    """

    lr: Optional[float] = None          # absolute lr; derived from blr if None
    blr: float = 2.5e-4                 # base lr (scaled by eff_batch/256)
    eps: float = 1e-8
    betas: Tuple[float, float] = (0.9, 0.999)
    weight_decay: float = 1e-3


@dataclass
class ScheduleConfig:
    """Per-iteration cosine schedule with linear warmup prefix.

    Matches timm CosineLRScheduler as used by the reference
    (reference lr_sched.py:44-77: t_in_epochs=False, warmup_prefix=True,
    t_initial = total_steps - warmup_steps, cycle_limit=1).
    """

    sched: str = "cosine"               # cosine | step | none
    warmup_lr: float = 1e-6
    min_lr: float = 1e-5
    warmup_epochs: int = 20
    decay_epochs: float = 30.0          # for 'step'
    decay_rate: float = 0.1
    cooldown_epochs: int = 10


@dataclass
class AugmentConfig:
    """Training augmentation, mirroring timm create_transform usage
    (reference datasets.py:127-163)."""

    color_jitter: float = 0.4
    auto_augment: str = "rand-m9-mstd0.5-inc1"
    train_interpolation: str = "bicubic"
    reprob: float = 0.25                # RandomErasing prob
    remode: str = "pixel"
    recount: int = 1
    # RandomResizedCrop params (timm defaults)
    scale: Tuple[float, float] = (0.08, 1.0)
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0)


@dataclass
class MixupConfig:
    """Mixup/CutMix (reference search.py:144-156, 478-484, 650-655).

    During search both default to 0 (off); the engine turns on
    mixup=0.8/cutmix=1.0 after finish_search (reference search.py:650-655).
    """

    mixup: float = 0.0
    cutmix: float = 0.0
    cutmix_minmax: Optional[Tuple[float, float]] = None
    prob: float = 1.0
    switch_prob: float = 0.5
    mode: str = "batch"
    label_smoothing: float = 0.1


@dataclass
class DistillationConfig:
    """Teacher distillation (reference losses.py:10-64, search.py:158-164)."""

    teacher_model: str = "regnety_160"
    teacher_path: str = ""
    distillation_type: str = "none"     # none | soft | hard
    alpha: float = 0.5
    tau: float = 1.0


@dataclass
class DataConfig:
    data_path: str = ""
    data_set: str = "IMNET"             # CIFAR10|CIFAR100|IMNET|IMNET100|SYNTHETIC
    input_size: int = 224
    num_workers: int = 10
    repeated_aug: bool = True           # RASampler (reference samplers.py:8-59)
    batch_size: int = 128               # per-host micro batch
    synthetic_num_classes: int = 1000   # classes when data_set == SYNTHETIC
    synthetic_size: int = 2048          # samples per synthetic epoch


@dataclass
class SearchConfig:
    """Everything the reference's search.py CLI exposes, typed.

    Search-specific knobs: reference search.py:199-224.
    """

    # run shape
    model: str = "deit_small_patch16_224_mim"
    epochs: int = 100
    accum_iter: int = 2
    fuse_point: int = 50
    seed: int = 0
    start_epoch: int = 0
    output_dir: str = "runs/test"

    # model regularization
    drop: float = 0.0
    drop_path: float = 0.1
    mask_ratio: float = 1.0             # constant keep-ratio if patch search off
    mae: bool = True
    norm_pix_loss: bool = True

    # search-space toggles (reference search.py:210-215)
    attn_search: bool = True
    mlp_search: bool = True
    embed_search: bool = True
    patch_search: bool = False
    head_search: bool = False
    channel_search: bool = False
    freeze_weights: bool = False

    # loss weights (reference search.py:200-205; defaults from argparse)
    w_head: float = 0.5
    w_mlp: float = 0.5
    w_patch: float = 0.0
    w_embedding: float = 0.5
    w_flops: float = 5.0
    w_decoder: float = 1.0
    target_flops: float = 1.0           # GFLOPs

    # sparsity-loss term toggles (reference search.py:217-220, inverted)
    progressive: bool = True
    entropy: bool = True
    var: bool = True
    norm: bool = True

    # PMIM annealing (reference search.py:207-208, engine.py:102-109)
    max_ratio: float = 0.95
    min_ratio: float = 0.75

    # compress cadence: events per epoch (reference engine.py:201)
    compress_per_epoch: int = 3
    compress_thresh: float = 0.2        # reference engine.py:205

    # optimizer families
    optim_param: OptimFamilyConfig = field(default_factory=OptimFamilyConfig)
    optim_arch: OptimFamilyConfig = field(
        default_factory=lambda: OptimFamilyConfig(betas=(0.5, 0.999)))
    optim_decoder: OptimFamilyConfig = field(default_factory=OptimFamilyConfig)
    clip_grad: Optional[float] = None
    schedule: ScheduleConfig = field(default_factory=ScheduleConfig)

    # EMA (reference search.py:47-54; off by default for search)
    model_ema: bool = False
    model_ema_decay: float = 0.99996

    # data / aug
    data: DataConfig = field(default_factory=DataConfig)
    augment: AugmentConfig = field(default_factory=AugmentConfig)
    mixup: MixupConfig = field(default_factory=MixupConfig)
    distillation: DistillationConfig = field(default_factory=DistillationConfig)

    # resume
    resume: bool = False
    checkpoint: str = ""
    pretrained_path: str = ""

    # precision / parallelism (TPU-native; no reference analog)
    compute_dtype: str = "bfloat16"
    mesh_shape: Optional[Tuple[int, ...]] = None   # default: all devices on 'data'
    log_every: int = 10

    def resolve(self, world_size: int = 1) -> "SearchConfig":
        """Fill derived lrs: lr = blr * eff_batch / 256
        (reference search.py:509-518)."""
        eff_batch = self.data.batch_size * self.accum_iter * world_size
        out = dataclasses.replace(self)
        for name in ("optim_param", "optim_arch", "optim_decoder"):
            fam: OptimFamilyConfig = getattr(out, name)
            if fam.lr is None:
                setattr(out, name,
                        dataclasses.replace(fam, lr=fam.blr * eff_batch / 256))
        return out


@dataclass
class FinetuneConfig:
    """The reference's finetune.py CLI surface (finetune.py:30-179)."""

    model: str = "deit_small_patch16_224_finetune"
    epochs: int = 300
    accum_iter: int = 1
    seed: int = 0
    start_epoch: int = 0
    output_dir: str = "runs/finetune"
    finetune: str = ""                  # path to searched best/fused checkpoint

    drop: float = 0.0
    drop_path: float = 0.1

    blr: float = 1.5e-4
    lr: Optional[float] = None
    layer_decay: float = 0.95           # reference lr_decay.py:15-61
    weight_decay: float = 0.05
    eps: float = 1e-8
    betas: Tuple[float, float] = (0.9, 0.999)
    clip_grad: Optional[float] = None
    schedule: ScheduleConfig = field(
        default_factory=lambda: ScheduleConfig(warmup_epochs=5, min_lr=1e-6))

    model_ema: bool = True
    model_ema_decay: float = 0.99996

    data: DataConfig = field(default_factory=DataConfig)
    augment: AugmentConfig = field(default_factory=AugmentConfig)
    mixup: MixupConfig = field(
        default_factory=lambda: MixupConfig(mixup=0.8, cutmix=1.0))
    distillation: DistillationConfig = field(default_factory=DistillationConfig)

    resume: bool = False
    checkpoint: str = ""

    compute_dtype: str = "bfloat16"
    mesh_shape: Optional[Tuple[int, ...]] = None
    log_every: int = 10

    def resolve(self, world_size: int = 1) -> "FinetuneConfig":
        eff_batch = self.data.batch_size * self.accum_iter * world_size
        out = dataclasses.replace(self)
        if out.lr is None:
            out.lr = out.blr * eff_batch / 256
        return out
