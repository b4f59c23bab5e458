"""Three-family optimizer (param / arch / decoder) + per-iteration schedules.

The reference builds three AdamW optimizers over disjoint parameter groups
(reference search.py:486-559: no-decay/decay weights, decoder params, alpha
arch params) and steps them together each accumulation boundary
(reference engine.py:170-184). Here this is one `optax.multi_transform`
over the combined (params, alphas) pytree with five labels:

    param_nd   1-D tensors / biases / skip-list names, wd=0
    param_d    other weights, wd=weight_decay
    dec_nd     decoder family, no decay
    dec_d      decoder family, decayed
    arch       every alpha, AdamW(betas=(0.5, 0.999), wd=1e-3)

The no-weight-decay skip list follows reference
models/vision_transformer.py:529-532: pos_embed, cls_token, dist_token,
mask_token, score (plus anything 1-D).

Structural optimizer-state surgery (the reference's AdamW.update,
optim.py:122-182) is unnecessary during search because shapes never change;
the only reference behavior to reproduce is zeroing Adam moments of `score`
and `alpha` at prune events (`initialize=True` calls, reference
models/layers.py:280,633,943,247) — see `zero_adam_moments`.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import OptimFamilyConfig, ScheduleConfig


# ---------------------------------------------------------------------------
# Schedules (timm CosineLRScheduler semantics, reference lr_sched.py:44-77)
# ---------------------------------------------------------------------------

def cosine_schedule(base_lr: float, sched: ScheduleConfig, total_steps: int,
                    steps_per_epoch: int) -> optax.Schedule:
    """Per-iteration cosine with a linear warmup prefix.

    warmup: warmup_lr -> base_lr over warmup_epochs*steps_per_epoch steps;
    then cosine base_lr -> min_lr over (total - warmup) steps; flat at
    min_lr afterwards (cycle_limit=1).
    """
    warmup_steps = int(sched.warmup_epochs * steps_per_epoch)
    decay_steps = max(total_steps - warmup_steps, 1)

    def fn(count):
        count = jnp.asarray(count, jnp.float32)
        warm = sched.warmup_lr + (base_lr - sched.warmup_lr) * (
            count / max(warmup_steps, 1))
        t = jnp.clip((count - warmup_steps) / decay_steps, 0.0, 1.0)
        cos = sched.min_lr + (base_lr - sched.min_lr) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * t))
        return jnp.where(count < warmup_steps, warm, cos)

    return fn


def step_schedule(base_lr: float, sched: ScheduleConfig,
                  steps_per_epoch: int) -> optax.Schedule:
    """Step decay (reference lr_sched.py:94-105)."""
    decay_steps = int(sched.decay_epochs * steps_per_epoch)

    def fn(count):
        k = jnp.floor(jnp.asarray(count, jnp.float32) / max(decay_steps, 1))
        return base_lr * (sched.decay_rate ** k)

    return fn


def tanh_schedule(base_lr: float, sched: ScheduleConfig, total_steps: int,
                  steps_per_epoch: int, lb: float = -7.0, ub: float = 3.0
                  ) -> optax.Schedule:
    """timm TanhLRScheduler semantics (reference lr_sched.py:78-93):
    lr = min + (base - min) * 0.5 * (1 - tanh(lb + (ub-lb) * t))."""
    warmup_steps = int(sched.warmup_epochs * steps_per_epoch)
    decay_steps = max(total_steps - warmup_steps, 1)

    def fn(count):
        count = jnp.asarray(count, jnp.float32)
        warm = sched.warmup_lr + (base_lr - sched.warmup_lr) * (
            count / max(warmup_steps, 1))
        t = jnp.clip((count - warmup_steps) / decay_steps, 0.0, 1.0)
        tt = lb + (ub - lb) * t
        tanh_lr = sched.min_lr + (base_lr - sched.min_lr) * 0.5 * (
            1.0 - jnp.tanh(tt))
        return jnp.where(count < warmup_steps, warm, tanh_lr)

    return fn


def make_schedule(base_lr: float, sched: ScheduleConfig, total_steps: int,
                  steps_per_epoch: int) -> optax.Schedule:
    """Dispatch over the reference's scheduler set (lr_sched.py:44-123).
    'plateau' needs a metric feedback loop: the in-graph schedule is
    constant and PlateauTracker's scale is applied through the lr_scale
    slot in the optimizer state (see with_lr_scale / set_lr_scale)."""
    if sched.sched == "cosine":
        return cosine_schedule(base_lr, sched, total_steps, steps_per_epoch)
    if sched.sched == "tanh":
        return tanh_schedule(base_lr, sched, total_steps, steps_per_epoch)
    if sched.sched == "step":
        return step_schedule(base_lr, sched, steps_per_epoch)
    if sched.sched in ("plateau", "constant"):
        # warmup prefix then flat base_lr; the plateau decay itself rides
        # the lr_scale slot (timm PlateauLRScheduler also applies warmup,
        # reference lr_sched.py:106-121)
        warmup_steps = int(sched.warmup_epochs * steps_per_epoch)

        def fn(count):
            count = jnp.asarray(count, jnp.float32)
            warm = sched.warmup_lr + (base_lr - sched.warmup_lr) * (
                count / max(warmup_steps, 1))
            return jnp.where(count < warmup_steps, warm, base_lr)

        return fn
    raise ValueError(f"unknown scheduler '{sched.sched}' "
                     "(cosine | tanh | step | plateau | constant)")


class PlateauTracker:
    """Host-side plateau LR control (reference lr_sched.py:106-121):
    multiply a scale factor by decay_rate after `patience` epochs without
    metric improvement. The scale is passed into the step as an operand
    and multiplied onto the schedule output."""

    def __init__(self, patience: int = 10, decay_rate: float = 0.1,
                 mode: str = "max", min_scale: float = 1e-3):
        self.patience = patience
        self.decay_rate = decay_rate
        self.mode = mode
        self.best = None
        self.bad_epochs = 0
        self.scale = 1.0
        self.min_scale = min_scale

    def update(self, metric: float) -> float:
        better = (self.best is None
                  or (metric > self.best if self.mode == "max"
                      else metric < self.best))
        if better:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.scale = max(self.scale * self.decay_rate,
                                 self.min_scale)
                self.bad_epochs = 0
        return self.scale


# ---------------------------------------------------------------------------
# Plateau scale plumbing: the tracker lives host-side; its scale is a slot
# in the optimizer state multiplied onto every update tensor (equivalent to
# scaling the lr, incl. the decoupled weight-decay term — same as torch's
# ReduceLROnPlateau acting on AdamW's lr).
# ---------------------------------------------------------------------------

class LrScaleState(NamedTuple):
    scale: jnp.ndarray            # f32 scalar, host-set between epochs
    inner: Any


def with_lr_scale(tx: optax.GradientTransformation
                  ) -> optax.GradientTransformation:
    """Wrap a transformation so its final updates are multiplied by a
    host-controlled scalar held in the optimizer state (jit-stable: the
    scale is an ordinary traced operand, no recompilation on change)."""

    def init(params):
        return LrScaleState(jnp.asarray(1.0, jnp.float32), tx.init(params))

    def update(grads, state, params=None):
        upd, inner = tx.update(grads, state.inner, params)
        scale = state.scale
        upd = jax.tree_util.tree_map(
            lambda u: u * scale.astype(u.dtype), upd)
        return upd, LrScaleState(scale, inner)

    return optax.GradientTransformation(init, update)


def set_lr_scale(opt_state: LrScaleState, scale: float) -> LrScaleState:
    """Host-side: write the PlateauTracker scale into the state."""
    return opt_state._replace(scale=jnp.asarray(scale, jnp.float32))


# ---------------------------------------------------------------------------
# Labeling
# ---------------------------------------------------------------------------

NO_DECAY_NAMES = ("pos_embed", "cls_token", "dist_token", "mask_token",
                  "score")


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return ".".join(parts)


def label_params(params) -> Any:
    """Family labels for the weight tree (reference search.py:489-508)."""
    def lab(path, leaf):
        name = _path_str(path)
        decoder = "decoder" in name
        nd = (leaf.ndim <= 1 or name.endswith("bias")
              or any(k in name for k in NO_DECAY_NAMES))
        if decoder:
            return "dec_nd" if nd else "dec_d"
        return "param_nd" if nd else "param_d"
    return jax.tree_util.tree_map_with_path(lab, params)


def label_alphas(alphas) -> Any:
    return jax.tree_util.tree_map(lambda _: "arch", alphas)


def make_trainable_mask(params, alphas, *, freeze_weights: bool,
                        searchable_score_paths: Optional[set] = None,
                        w_head: float = 0.5, w_mlp: float = 0.5,
                        w_patch: float = 0.0, w_embedding: float = 0.5
                        ) -> Tuple[Any, Any]:
    """Static 0/1 update masks.

    * non-searchable module scores are plain buffers in the reference
      (models/layers.py:164,480,834) -> frozen;
    * `freeze_weights` keeps only alpha/score/norm/token/decoder/mask/head
      trainable (reference search.py:421-426);
    * a zero loss weight freezes that dimension's alphas
      (`correct_require_grad`, reference models/base_model.py:88-102).
    """
    def pmask(path, leaf):
        name = _path_str(path)
        if searchable_score_paths is not None and name.endswith("score") \
                and name not in searchable_score_paths:
            return 0.0
        if freeze_weights:
            keep = any(k in name for k in ("alpha", "score", "norm", "token",
                                           "decoder", "mask", "head"))
            return 1.0 if keep else 0.0
        return 1.0

    def amask(path, leaf):
        name = _path_str(path)
        if "patch" in name and w_patch == 0:
            return 0.0
        if "embed" in name and w_embedding == 0:
            return 0.0
        if "attn" in name and w_head == 0:
            return 0.0
        if "mlp" in name and w_mlp == 0:
            return 0.0
        return 1.0

    return (jax.tree_util.tree_map_with_path(pmask, params),
            jax.tree_util.tree_map_with_path(amask, alphas))


# ---------------------------------------------------------------------------
# Optimizer construction
# ---------------------------------------------------------------------------

def _adamw(fam: OptimFamilyConfig, schedule: optax.Schedule, wd: float,
           clip: Optional[float]) -> optax.GradientTransformation:
    tx = optax.adamw(learning_rate=schedule, b1=fam.betas[0], b2=fam.betas[1],
                     eps=fam.eps, weight_decay=wd)
    if clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)
    return tx


def build_search_optimizer(
    cfg_param: OptimFamilyConfig, cfg_arch: OptimFamilyConfig,
    cfg_dec: OptimFamilyConfig, sched: ScheduleConfig, *,
    total_steps: int, steps_per_epoch: int,
    clip_grad: Optional[float] = None, accum_iter: int = 1,
    sched_arch: Optional[ScheduleConfig] = None,
) -> Tuple[optax.GradientTransformation, Dict[str, optax.Schedule]]:
    """The reference's three AdamW optimizers as one multi_transform.

    Schedules are per *micro*-iteration (the reference steps its schedulers
    with epoch*len(loader)+iter in micro steps, engine.py:178-184) while
    optax counts optimizer updates (one per accumulation window), so each
    schedule is evaluated at count * accum_iter. `total_steps` /
    `steps_per_epoch` are in micro-iterations.

    `sched_arch` optionally overrides the schedule for the ARCH family
    only (param/decoder keep `sched`). Rationale (alpha_tail.py, BENCH.md
    round 5): organic cell kills are alpha-drift events and drift is
    ~linear in arch LR, so the shared cosine decaying to ~0 freezes the
    convergence tail — the last open modules flatline just above the kill
    threshold. A floor (e.g. min_lr = 0.15x peak) keeps the tail moving;
    the reference has no analog because its 125k-step runs converge long
    before the decay bites.
    """
    def scaled(fn):
        if accum_iter == 1:
            return fn
        return lambda count: fn(count * accum_iter)

    sch_param = scaled(make_schedule(cfg_param.lr, sched, total_steps,
                                     steps_per_epoch))
    sch_arch = scaled(make_schedule(cfg_arch.lr, sched_arch or sched,
                                    total_steps, steps_per_epoch))
    sch_dec = scaled(make_schedule(cfg_dec.lr, sched, total_steps,
                                   steps_per_epoch))

    tx = optax.multi_transform(
        {
            "param_nd": _adamw(cfg_param, sch_param, 0.0, clip_grad),
            "param_d": _adamw(cfg_param, sch_param, cfg_param.weight_decay,
                              clip_grad),
            "dec_nd": _adamw(cfg_dec, sch_dec, 0.0, clip_grad),
            "dec_d": _adamw(cfg_dec, sch_dec, cfg_dec.weight_decay,
                            clip_grad),
            "arch": _adamw(cfg_arch, sch_arch, cfg_arch.weight_decay,
                           clip_grad),
        },
        param_labels=lambda tree: (label_params(tree[0]),
                                   label_alphas(tree[1])),
    )
    return tx, {"param": sch_param, "arch": sch_arch, "decoder": sch_dec}


# ---------------------------------------------------------------------------
# Moment surgery (reference optim.py:122-182 `initialize=True` semantics)
# ---------------------------------------------------------------------------

def zero_adam_moments(opt_state, predicate: Callable[[str], bool]):
    """Zero exp_avg/exp_avg_sq for leaves whose tree path matches
    `predicate`. Walks arbitrary optax state nesting and patches every
    ScaleByAdamState found."""

    def patch(state):
        if isinstance(state, optax.ScaleByAdamState):
            def z(tree):
                def f(path, leaf):
                    if leaf is None or not hasattr(leaf, "shape"):
                        return leaf
                    if predicate(_path_str(path)):
                        return jnp.zeros_like(leaf)
                    return leaf
                return jax.tree_util.tree_map_with_path(f, tree)
            return state._replace(mu=z(state.mu), nu=z(state.nu))
        if isinstance(state, tuple) and hasattr(state, "_fields"):
            return type(state)(*[patch(s) for s in state])
        if isinstance(state, tuple):
            return tuple(patch(s) for s in state)
        if isinstance(state, list):
            return [patch(s) for s in state]
        if isinstance(state, dict):
            return {k: patch(v) for k, v in state.items()}
        return state

    return patch(opt_state)
