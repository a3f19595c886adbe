"""A/B the fused Pallas (L, L^{-1}) leaf vs the stock chol+trsm leaf pair
inside the blocked Cholesky, on the real chip (VERDICT round-5 item 4).

Usage:  GP_TPU_PALLAS_LEAF={0|1} python benchmarks/leaf_ab.py [N ...]

The env toggle is read at trace time, so each setting needs its own
process.  Prints median-of-5 wall per factorization and the implied
TFLOP/s (N^3/3).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import gp_tpu  # noqa: F401  (config side effects: matmul precision, cache)
from gp_tpu.ops.blocked import blocked_cholesky


def run(n: int):
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (n, 256), jnp.float32)

    @jax.jit
    def build(w):
        K = (w @ w.T) / 256.0
        idx = jnp.arange(n)
        return K.at[idx, idx].add(4.0)

    K = build(w)
    K.block_until_ready()

    fac = jax.jit(lambda K: blocked_cholesky(K, zero_upper=False))
    L = fac(K)
    L.block_until_ready()                      # compile
    # correctness probe: finite diagonal
    d = np.asarray(jnp.diagonal(L)[:8])
    assert np.all(np.isfinite(d)) and np.all(d > 0), d

    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        fac(K).block_until_ready()
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    tf = n ** 3 / 3 / med / 1e12
    leaf = os.environ.get("GP_TPU_PALLAS_LEAF", "auto")
    print(f"N={n:6d} leaf={leaf}: {med * 1e3:8.2f} ms  "
          f"{tf:6.2f} TFLOP/s  (spread {min(ts)*1e3:.2f}-{max(ts)*1e3:.2f})")
    return med


if __name__ == "__main__":
    ns = [int(a) for a in sys.argv[1:]] or [8192, 16384]
    for n in ns:
        run(n)
