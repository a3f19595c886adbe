"""Benchmark harness (driver contract: prints ONE JSON line).

Headline metric: fused (NLL + analytic-gradient) evaluations per second for
the exact GP on the reference's bundled workload (N=8000, d=24, SE-ARD) —
the inner operation of the hot training loop (SURVEY.md section 3.1: one
O(N^3) factorization + gradient per NLOPT evaluation, <=160 per fit).

vs_baseline compares against the reference-equivalent CPU implementation
(benchmarks/ref_equiv.py — NumPy doubles on BLAS standing in for the
unbuildable Eigen/NLOPT reference; see BASELINE.md), measured once on this
image and recorded in benchmarks/baseline_cpu.json.

A second reading at N=16384 (synthetic rows, d=10 — the size where the
factorization's MXU story is strongest, BASELINE.md round-4 tables) is
attached as extra fields on the same line; the headline metric/value
stay the bundled-workload N=8000 reading.

Env overrides: GP_BENCH_N (default 8000), GP_BENCH_REPS (default 20),
GP_BENCH_N2 (default 16384; 0 disables the second reading).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    # persistent compilation cache: repeat bench runs skip the ~2-4 min
    # TPU compile of the fused NLL+grad program
    cache = os.environ.get("GP_TPU_COMPILE_CACHE",
                           os.path.expanduser("~/.cache/gp_tpu_xla"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from gp_tpu import SE_ARD
    from gp_tpu.models import exact
    from gp_tpu.models.base import default_hyps
    from gp_tpu.utils.io import read_matrix
    import gp_tpu.config as config

    n = int(os.environ.get("GP_BENCH_N", 8000))
    reps = int(os.environ.get("GP_BENCH_REPS", 20))

    ref = "/root/reference/data"
    X = read_matrix(os.path.join(ref, "train_x"))[:n]
    y = read_matrix(os.path.join(ref, "train_y"))[:n].ravel()

    dt = config.default_dtype()
    x_d = jnp.asarray(X, dt)
    y_d = jnp.asarray(y, dt)
    hyp = jnp.asarray(default_hyps(SE_ARD, X, y, 1e-3, False), dt)

    fun = jax.jit(lambda h: exact.objective_vg(SE_ARD, False, h, x_d, y_d))

    # Warm up / compile, and perturb the hyps per rep so no caching tricks
    # can hide work.
    f0, g0 = fun(hyp)
    jax.block_until_ready((f0, g0))

    rng = np.random.default_rng(0)
    # three timing groups, report the MEDIAN group rate: run-to-run
    # spread on the tunneled chip is ~3% (BASELINE round 5), and a
    # single timing window can land on either tail
    rates = []
    for _ in range(3):
        hs = [hyp + jnp.asarray(0.01 * rng.standard_normal(hyp.shape), dt)
              for _ in range(reps)]
        t0 = time.perf_counter()
        outs = [fun(h) for h in hs]
        jax.block_until_ready(outs)
        rates.append(reps / (time.perf_counter() - t0))
    evals_per_s = float(np.median(rates))
    spread = (max(rates) - min(rates)) / 2.0

    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "benchmarks", "baseline_cpu.json")
    vs = None
    if os.path.exists(base_path):
        with open(base_path) as fh:
            base = json.load(fh)
        key = f"nll_grad_s_n{n}"
        if key in base:
            baseline_evals_per_s = 1.0 / float(base[key])
            vs = evals_per_s / baseline_evals_per_s

    out = {
        "metric": f"exact_gp_nll_grad_evals_per_s_n{n}_d{X.shape[1]}",
        "value": round(evals_per_s, 4),
        "unit": "evals/s",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "spread": round(spread, 4),           # (max-min)/2 of 3 groups
        "backend": jax.default_backend(),
        "dtype": jnp.dtype(dt).name,
        "nll_at_default": float(f0),
    }

    n2 = int(os.environ.get("GP_BENCH_N2", 16384))
    if n2:
        from benchmarks.synth import make_data
        X2, y2 = make_data(n2, d=10, seed=42)
        x2_d = jnp.asarray(X2, dt)
        y2_d = jnp.asarray(y2, dt)
        hyp2 = jnp.asarray(default_hyps(SE_ARD, X2, y2, 1e-3, False), dt)
        fun2 = jax.jit(lambda h: exact.objective_vg(SE_ARD, False, h,
                                                    x2_d, y2_d))
        f2, g2 = fun2(hyp2)
        jax.block_until_ready((f2, g2))
        reps2 = max(4, reps // 4)
        hs2 = [hyp2 + jnp.asarray(0.01 * rng.standard_normal(hyp2.shape),
                                  dt) for _ in range(reps2)]
        t0 = time.perf_counter()
        outs2 = [fun2(h) for h in hs2]
        jax.block_until_ready(outs2)
        out["evals_per_s_n16384_d10"] = round(reps2 / (time.perf_counter()
                                                       - t0), 4)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
