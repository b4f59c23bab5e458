"""Pallas fused attention: forward/backward correctness vs the jnp
reference, in interpreter mode on CPU (SURVEY §7.2 M7 kernel)."""

import numpy as np
import jax
import jax.numpy as jnp

from ofb_tpu.ops.pallas_attention import (_mha_pallas,
                                          _mha_reference_prescaled,
                                          fused_mha)


def _rand_qkv(key, B=2, H=3, N=24, d=16, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    return [jax.random.normal(k, (B, N, H, d), dtype) * 0.5 for k in ks]


def test_forward_matches_reference():
    q, k, v = _rand_qkv(jax.random.PRNGKey(0))
    scale = 0.25
    ref = fused_mha(q, k, v, scale, force=False)
    out = fused_mha(q, k, v, scale, force=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_backward_matches_reference():
    q, k, v = _rand_qkv(jax.random.PRNGKey(1))
    scale = 0.25

    def loss_ref(q, k, v):
        o = fused_mha(q, k, v, scale, force=False)
        return jnp.sum(o * o)

    def loss_pl(q, k, v):
        o = fused_mha(q, k, v, scale, force=True, interpret=True)
        return jnp.sum(o * o)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_pl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_traced_scale_ok():
    q, k, v = _rand_qkv(jax.random.PRNGKey(2))

    @jax.jit
    def f(q, k, v, s):
        return fused_mha(q, k, v, s, force=True, interpret=True)

    out1 = f(q, k, v, jnp.asarray(0.25))
    out2 = f(q, k, v, jnp.asarray(0.5))
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_vit_attention_cpu_fallback_unchanged():
    """On CPU the model paths must route to the jnp reference and produce
    identical results to the pre-kernel implementation."""
    from ofb_tpu.models.vit import ModelCfg, init_vit_params, vit_forward
    cfg = ModelCfg(img_size=32, patch_size=8, num_classes=10, embed_dim=32,
                   depth=1, num_heads=2)
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    logits = vit_forward(params, x, cfg, compute_dtype=jnp.float32)
    assert np.isfinite(np.asarray(logits)).all()
