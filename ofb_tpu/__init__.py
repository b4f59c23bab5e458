"""ofb_tpu — a TPU-native (JAX/XLA/Pallas/pjit) Once-for-Both framework.

A from-scratch rebuild of the capabilities of HankYe/Once-for-Both (CVPR'24):
single-stage Vision-Transformer compression that jointly searches the
importance ("saliency") and sparsity of every prunable dimension of a DeiT
backbone — attention head-count x per-head QKV channels, MLP hidden width,
patch-embedding width and patch (token) count — while training the weights,
regularized by Progressive Masked Image Modeling (PMIM).

Design (TPU-first, not a port):
  * All searchable dimensions are expressed as *static-shape multiplicative
    gates*; the reference's mid-training physical tensor surgery
    (reference models/layers.py compress paths) becomes host-side updates of
    small arch-state arrays (switch cells, hard masks, flags), so the whole
    train step stays inside one jitted XLA program.
  * Data parallelism (the reference's DDP/NCCL) is a `jax.sharding.Mesh`
    axis; gradient and arch-parameter consensus is implicit in SPMD
    (replicated params are bitwise identical across devices) instead of
    explicit all-reduce (reference models/layers.py:9-14).
  * Physical pruning happens once, at export time (`ofb_tpu.core.export`),
    mirroring the reference's `intersect` (reference finetune.py:182-249).

Package map:
  models/    dense ViT + searchable MIM-ViT model defs, search space, registry
  ops/       gate math, masked layernorm, PMIM ops, FLOPs model, augmentation
  core/      losses, optimizers, train steps, compress state machine, export,
             checkpointing, engine loops
  data/      datasets, samplers (RA), input pipeline
  parallel/  mesh construction + sharding rules
  utils/     metric logging, EMA, profiling
"""

__version__ = "0.1.0"

# Convenience API (lazy to keep bare import light)


def create_model(name, **kwargs):
    from .models.registry import create_model as _cm
    return _cm(name, **kwargs)


def list_models():
    from .models.registry import list_models as _lm
    return _lm()
