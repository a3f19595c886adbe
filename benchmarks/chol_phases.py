"""Phase-level timing of the blocked Cholesky on the real chip.

Measurement discipline (benchmarks/README.md): EVERY call gets a distinct
input (an execution-replay layer on this image makes any repeated
(program, inputs) pair appear to cost microseconds — cycling a pool of
inputs is NOT enough).  The heavy operand may be shared as long as one
argument differs per call (the validated bench.py pattern: distinct small
perturbations).  Per-call block_until_ready, median-of-reps, dispatch
floor measured with a trivial program and subtracted.

Usage: python benchmarks/chol_phases.py [N [BLOCK]]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _bench(fn, args_per_rep, disp=0.0):
    """Median seconds per call; every element of args_per_rep is distinct.

    fn must return a SCALAR (e.g. jnp.sum of the result): device->host
    transfer of the scalar inside the timed region forces the compute to
    complete (block_until_ready alone has returned early on this image's
    remote tunnel for large outputs)."""
    acc = float(np.asarray(fn(*args_per_rep[0])))
    ts = []
    for args in args_per_rep[1:]:
        t0 = time.perf_counter()
        acc += float(np.asarray(fn(*args)))
        ts.append(time.perf_counter() - t0)
    assert np.isfinite(acc)
    return max(float(np.median(ts)) - disp, 1e-9)


def main():
    import jax
    import jax.numpy as jnp

    import gp_tpu.config  # noqa: F401  (matmul precision, cache)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    block = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    reps = int(os.environ.get("REPS", 6))
    dt = jnp.float32

    # one heavy SPD base built ON DEVICE; distinct per-call scalar shifts
    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (n, n), dt)
    K0 = jax.jit(lambda a: a @ a.T / n + 2.0 * jnp.eye(n, dtype=dt))(A)
    jax.block_until_ready(K0)
    shifts = [jnp.asarray(1.0 + 0.001 * i, dt) for i in range(reps + 1)]

    # dispatch floor: trivial jitted program, distinct scalars
    triv = jax.jit(lambda c: jnp.sum(c + 1.0))
    disp = _bench(triv, [(s,) for s in shifts])
    print(f"dispatch floor: {disp*1e3:.2f} ms")

    flops = n ** 3 / 3

    def report(name, t, fl):
        print(f"{name:44s} {t*1e3:9.2f} ms  {fl/t/1e12:7.2f} TFLOP/s")

    # 1. stock cholesky
    stock = jax.jit(lambda K, c: jnp.sum(jnp.linalg.cholesky(
        K + c * jnp.eye(n, dtype=dt))))
    report(f"stock chol N={n}",
           _bench(stock, [(K0, s) for s in shifts], disp), flops)

    # 2. blocked cholesky (current default)
    from gp_tpu.ops.blocked import blocked_cholesky
    bl = jax.jit(lambda K, c: jnp.sum(blocked_cholesky(
        K + c * jnp.eye(n, dtype=dt), block=block)))
    report(f"blocked chol N={n} B={block}",
           _bench(bl, [(K0, s) for s in shifts], disp), flops)

    # 3. trailing-update SYRK alone: X - P P^T with P (n-b, b)
    m = n - block
    P0 = jax.random.normal(key, (m, block), dt)
    syrk = jax.jit(lambda P, c: jnp.sum((c * P) @ P.T))
    report(f"first SYRK ({m}x{block})@({block}x{m})",
           _bench(syrk, [(P0, s) for s in shifts], disp), 2 * m * m * block)

    # 4. panel TRSM alone: solve_triangular(Ljj, (b, n-b))
    from jax.scipy.linalg import solve_triangular
    Lb = jax.jit(lambda K, c: jnp.linalg.cholesky(
        K[:block, :block] + c * jnp.eye(block, dtype=dt)))(K0, shifts[0])
    B0 = jax.random.normal(key, (block, m), dt)
    tr = jax.jit(lambda L, B, c: jnp.sum(solve_triangular(L, c * B, lower=True)))
    report(f"panel TRSM ({block}x{block})\\({block}x{m})",
           _bench(tr, [(Lb, B0, s) for s in shifts], disp), block * block * m)

    # 5. base-case chol at small sizes (latency-bound serial share)
    for bb in (256, 512, 1024):
        Kb = K0[:bb, :bb]
        st = jax.jit(lambda K, c, _bb=bb: jnp.sum(jnp.linalg.cholesky(
            K + c * jnp.eye(_bb, dtype=dt))))
        t = _bench(st, [(Kb, s) for s in shifts], disp)
        print(f"{'base chol N=' + str(bb):44s} {t*1e3:9.2f} ms")

    # 6. big matmul reference (practical peak at this precision)
    mm = jax.jit(lambda a, c: jnp.sum((c * a) @ a))
    report(f"dense matmul ({n}x{n})^2",
           _bench(mm, [(A, s) for s in shifts], disp), 2 * n ** 3)


if __name__ == "__main__":
    main()
