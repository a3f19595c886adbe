"""A/B the blocked-Cholesky base case on the real chip.

Compares, at base-block sizes B in {256, 512, 1024}:
  * stock jnp.linalg.cholesky (the current base case),
  * pallas_cholesky_panel at micro-panel widths w in {8, 32, 128, 256},
and then the end-to-end blocked factorization at N=8192 with each base.

Measurement discipline (benchmarks/README.md): distinct inputs per rep
(diagonal shifts), scalar fetched inside the timed region, dispatch floor
subtracted.

Usage: python benchmarks/chol_base_ab.py [--reps 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _bench(fn, inputs, disp=0.0):
    acc = float(np.asarray(fn(*inputs[0])))
    ts = []
    for args in inputs[1:]:
        t0 = time.perf_counter()
        acc += float(np.asarray(fn(*args)))
        ts.append(time.perf_counter() - t0)
    assert np.isfinite(acc), "non-finite"
    return max(float(np.median(ts)) - disp, 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import gp_tpu.config  # noqa: F401  (matmul precision, cache)
    from gp_tpu.ops.pallas_chol import pallas_cholesky_panel

    dt = jnp.float32 if jax.default_backend() == "tpu" else jnp.float64
    reps = args.reps

    triv = jax.jit(lambda c: jnp.sum(c + 1.0))
    disp = _bench(triv, [(jnp.asarray(float(i), dt),)
                         for i in range(reps + 1)])
    print(json.dumps({"metric": "dispatch_floor_ms",
                      "value": round(disp * 1e3, 2)}), flush=True)

    rng = np.random.default_rng(0)
    for b in (256, 512, 1024):
        A = jnp.asarray(rng.standard_normal((b, b)), dt)
        K = jax.jit(lambda a: a @ a.T / b + 2.0 * jnp.eye(b, dtype=dt))(A)
        jax.block_until_ready(K)
        shifts = [(K, jnp.asarray(0.5 + 0.01 * i, dt))
                  for i in range(reps + 1)]

        stock = jax.jit(lambda Km, c: jnp.sum(
            jnp.linalg.cholesky(Km + c * jnp.eye(b, dtype=dt))))
        t = _bench(stock, shifts, disp)
        print(json.dumps({"metric": f"stock_chol_b{b}_ms",
                          "value": round(t * 1e3, 3)}), flush=True)

        for w in (8, 32, 128, 256):
            if w > b:
                continue
            try:
                pk = jax.jit(lambda Km, c, w=w: jnp.sum(
                    pallas_cholesky_panel(Km + c * jnp.eye(b, dtype=dt), w)))
                t = _bench(pk, shifts, disp)
                print(json.dumps({"metric": f"pallas_panel_chol_b{b}_w{w}_ms",
                                  "value": round(t * 1e3, 3)}), flush=True)
            except Exception as e:  # noqa: BLE001 — Mosaic rejections etc.
                print(json.dumps({"metric": f"pallas_panel_chol_b{b}_w{w}_ms",
                                  "error": repr(e)[:200]}), flush=True)

    # end-to-end blocked factorization at N=8192 with each base case
    from gp_tpu.ops import blocked

    n = 8192
    A = jnp.asarray(rng.standard_normal((n, n)), dt)
    K = jax.jit(lambda a: a @ a.T / n + 2.0 * jnp.eye(n, dtype=dt))(A)
    jax.block_until_ready(K)
    shifts = [(K, jnp.asarray(0.5 + 0.01 * i, dt)) for i in range(reps + 1)]

    full = jax.jit(lambda Km, c: jnp.sum(blocked.blocked_cholesky(
        Km + c * jnp.eye(n, dtype=dt), block=1024, zero_upper=False)))
    t = _bench(full, shifts, disp)
    print(json.dumps({"metric": "blocked_chol_n8192_stockbase_ms",
                      "value": round(t * 1e3, 2),
                      "tflops": round(n**3 / 3 / t / 1e12, 1)}), flush=True)


if __name__ == "__main__":
    main()
