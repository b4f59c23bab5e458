#!/usr/bin/env python
"""A/B probe: does zero-padding the contraction dim K=384 -> 512 speed up
the ViT-shaped matmuls on this chip?

BENCH.md's chip calibration shows big matmuls at 120-190 TF/s but the
DeiT-S band (K=384) at 25-60 TF/s; the untested hypothesis (VERDICT r3
next-8) is that the K-dim tiling is the limiter, which padding K to the
128-lane-multiple 512 would expose: if the padded matmul (33% more
physical FLOPs) takes LESS wall time, K-tiling is the bottleneck and the
model's qkv/fc kernels should carry zero-padded contraction dims.

Run on the TPU (axon default backend):  python scripts/kpad_probe.py
Prints one JSON line per shape with effective TF/s at the LOGICAL flop
count for both variants.
"""
from __future__ import annotations

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def bench_matmul(m: int, k: int, n: int, kpad: int, iters: int = 30):
    """Effective TF/s (logical 2*m*k*n) for K=k and K padded to kpad."""
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(m, k), jnp.bfloat16)
    w = jnp.asarray(rs.randn(k, n), jnp.bfloat16)
    xp = jnp.pad(x, ((0, 0), (0, kpad - k)))
    wp = jnp.pad(w, ((0, kpad - k), (0, 0)))

    @jax.jit
    def f(a, b):
        out = a
        for _ in range(iters):
            out = (out @ b) @ jnp.swapaxes(b, 0, 1) * 1e-3
        return jnp.float32(out.sum())

    def run(a, b):
        float(f(a, b))                       # compile + warm
        t0 = time.time()
        s = float(f(a, b))                   # host readback = sync
        dt = time.time() - t0
        assert np.isfinite(s)
        # each iter does fwd + transpose matmul: 2 matmuls
        logical = 2 * 2 * m * k * n * iters
        return logical / dt / 1e12

    return run(x, w), run(xp, wp)


def main():
    m = 256 * 197 // 8 * 8                  # DeiT-S batch x tokens, padded
    shapes = [("qkv", m, 384, 1152), ("proj", m, 384, 384),
              ("fc1", m, 384, 1536), ("fc2", m, 1536, 384),
              ("deit_b_qkv", m, 768, 2304)]
    for name, M, K, N in shapes:
        kp = ((K + 127) // 128) * 128 + 128  # next 128-multiple above K
        base, padded = bench_matmul(M, K, N, kp)
        print(json.dumps({"shape": name, "m": M, "k": K, "n": N,
                          "k_padded": kp,
                          "tf_s": round(base, 1),
                          "tf_s_padded_effective": round(padded, 1),
                          "padded_wins": padded > base * 1.02}), flush=True)


if __name__ == "__main__":
    main()
