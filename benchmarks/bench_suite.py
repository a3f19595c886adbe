"""Extended benchmark suite (one JSON line per metric).

`bench.py` at the repo root is the driver's single headline metric; this
suite records the fuller picture on the current backend:

  * exact-GP fused NLL+gradient evals/s (the training hot loop)
  * Cholesky wall-time and achieved GFLOP/s at N=8192
  * full train() wall-time on the bundled `gp 8000` workload
  * batched posterior prediction throughput (points/s)
  * FITC NLL+grad evals/s at N=8000, M=512

Usage:  python benchmarks/bench_suite.py [--n 8000] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _bench(fn, *args, reps=10):
    import jax
    o = fn(*args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(reps):
        o = fn(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / reps


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8000)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gp_tpu import SE_ARD
    from gp_tpu.models import exact, fitc
    from gp_tpu.models.base import default_hyps
    from gp_tpu.utils.io import read_matrix
    import gp_tpu.config as config

    reps = 3 if args.quick else 10
    backend = jax.default_backend()
    dt = config.default_dtype()

    ref = "/root/reference/data"
    X = read_matrix(os.path.join(ref, "train_x"))[:args.n]
    y = read_matrix(os.path.join(ref, "train_y"))[:args.n].ravel()
    Xs = read_matrix(os.path.join(ref, "test_x"))
    x_d, y_d = jnp.asarray(X, dt), jnp.asarray(y, dt)
    xs_d = jnp.asarray(Xs, dt)
    hyp = jnp.asarray(default_hyps(SE_ARD, X, y, 1e-3, False), dt)
    n, d = X.shape

    # 1. fused NLL + gradient
    vg = jax.jit(lambda h: exact.objective_vg(SE_ARD, False, h, x_d, y_d))
    t = _bench(vg, hyp, reps=reps)
    emit(metric=f"exact_nll_grad_evals_per_s_n{n}", value=round(1 / t, 3),
         unit="evals/s", backend=backend)

    # 2. Cholesky GFLOP/s at 8192
    m = 8192
    A = jax.random.normal(jax.random.PRNGKey(0), (m, m), dt)
    K = A @ A.T + m * jnp.eye(m, dtype=dt)
    from gp_tpu.ops.chol import cholesky
    t = _bench(jax.jit(cholesky), K, reps=reps)
    emit(metric="cholesky_gflops_n8192", value=round(m**3 / 3 / t / 1e9, 1),
         unit="GFLOP/s", wall_ms=round(t * 1e3, 2), backend=backend)

    # 3. full train (the `gp 8000` pipeline)
    from gp_tpu import GP
    gp = GP(X, y)
    t0 = time.perf_counter()
    nll = gp.train()
    t_train = time.perf_counter() - t0
    emit(metric=f"exact_train_wall_s_n{n}_d{d}", value=round(t_train, 2),
         unit="s (incl. compile)", final_nll=round(float(nll), 3),
         backend=backend)

    # 4. prediction throughput
    pred = lambda xs: gp.batch_predict(xs)
    t = _bench(pred, Xs, reps=reps)
    emit(metric=f"batch_predict_points_per_s_n{n}",
         value=round(Xs.shape[0] / t, 1), unit="points/s", backend=backend)

    # 5. FITC objective throughput (N x M panels)
    M = 512
    u_d = x_d[-M:]
    jit_u = jnp.asarray((0.1 * 1e-3) ** 2, dt)
    fvg = jax.jit(lambda h: fitc.objective_vg(SE_ARD, False, h, x_d, y_d,
                                              u_d, jit_u))
    t = _bench(fvg, hyp, reps=reps)
    emit(metric=f"fitc_nll_grad_evals_per_s_n{n}_m{M}",
         value=round(1 / t, 3), unit="evals/s", backend=backend)


if __name__ == "__main__":
    main()
