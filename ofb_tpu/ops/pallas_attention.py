"""Fused multi-head attention as a Pallas TPU kernel.

For ViT shapes (N = 197 tokens, d = 64) a whole head's attention fits in
VMEM (q,k,v,scores ~ 400 KB), so the kernel needs no KV tiling: one grid
cell per (batch, head) computes scores -> softmax -> p@v in a single fused
pass, keeping the N x N score matrix out of HBM entirely. The backward pass
recomputes the softmax (flash-style) and emits dq/dk/dv in one kernel.

This covers the attention inner loop of reference models/layers.py:382-394
/ 488-537 (the q@k / softmax / attn@v chain that torch materializes through
HBM each step). Gates and the (possibly traced) softmax scale are applied
to q/k/v *before* the kernel, so the same scale-free kernel serves dense
and bi-mask-gated attention.

Status: OPT-IN (OFB_PALLAS_ATTN=1). Measured on v5e, XLA's own fused
attention is slightly faster at ViT shapes once the (B,N,H,d)->(B,H,N,d)
layout transposes are counted (1613 vs 1516 img/s on the DeiT-S search
step, batch 256); Mosaic rejects block specs that would avoid the
transposes (trailing block dims must be 8/128-multiples or full). The
kernel is kept correct and tested for shapes where flash-style fusion wins
(longer sequences / larger models).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:                                     # pragma: no cover
    _HAS_PALLAS = False


def _use_pallas() -> bool:
    if os.environ.get("OFB_PALLAS_ATTN") != "1":
        return False
    if not _HAS_PALLAS:
        return False
    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:                                  # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# reference jnp path ((B, N, H, d) layout, q pre-scaled)
# ---------------------------------------------------------------------------

def _mha_reference_prescaled(q, k, v):
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k).astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", p, v)


# ---------------------------------------------------------------------------
# pallas kernels: (B, H, N, d) blocks, one (batch, head) per grid cell
# (Mosaic needs the trailing two block dims full or 8/128-aligned, so the
# head axis must be a leading grid axis)
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0, 0]                                    # (N, d)
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref):
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=-1, keepdims=True)         # (N, N) fp32

    dv = jax.lax.dot_general(p.astype(do.dtype), do,
                             (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v.astype(jnp.float32),
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
    dq = jnp.dot(ds.astype(k.dtype), k, preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(ds.astype(q.dtype), q,
                             (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _bh_spec(N, d):
    return pl.BlockSpec((1, 1, N, d), lambda b, h: (b, h, 0, 0),
                        memory_space=pltpu.VMEM)


def _mha_fwd_pallas(q, k, v, interpret):
    B, H, N, d = q.shape
    return pl.pallas_call(
        _fwd_kernel,
        grid=(B, H),
        in_specs=[_bh_spec(N, d)] * 3,
        out_specs=_bh_spec(N, d),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v)


def _mha_bwd_pallas(q, k, v, do, interpret):
    B, H, N, d = q.shape
    return pl.pallas_call(
        _bwd_kernel,
        grid=(B, H),
        in_specs=[_bh_spec(N, d)] * 4,
        out_specs=[_bh_spec(N, d)] * 3,
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype)] * 3,
        interpret=interpret,
    )(q, k, v, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _mha_pallas(q, k, v, interpret):
    return _mha_fwd_pallas(q, k, v, interpret)


def _mha_pallas_fwd(q, k, v, interpret):
    return _mha_fwd_pallas(q, k, v, interpret), (q, k, v)


def _mha_pallas_bwd(interpret, res, do):
    q, k, v = res
    dq, dk, dv = _mha_bwd_pallas(q, k, v, do, interpret)
    return dq, dk, dv


_mha_pallas.defvjp(_mha_pallas_fwd, _mha_pallas_bwd)


def fused_mha(q, k, v, scale, *, force: Optional[bool] = None,
              interpret: bool = False):
    """Softmax attention over (B, N, H, d) — the model's native layout;
    `scale` may be traced (folded into q; the kernel is scale-free)."""
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    use = _use_pallas() if force is None else force
    if not use:
        return _mha_reference_prescaled(q, k, v)
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    return _mha_pallas(qt, kt, vt, interpret).transpose(0, 2, 1, 3)
