"""Phase-level timing of the blocked Cholesky on the real chip.

Measurement discipline (benchmarks/README.md): distinct pre-materialized
inputs per rep, per-call block_until_ready, min-of-reps, dispatch overhead
measured with a trivial program and subtracted.

Usage: python benchmarks/chol_phases.py [N [BLOCK]]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _bench(fn, inputs, reps=None):
    """min seconds per call over distinct inputs."""
    import jax
    reps = reps or len(inputs)
    out = fn(*inputs[0])
    jax.block_until_ready(out)
    ts = []
    for i in range(reps):
        args = inputs[i % len(inputs)]
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    import gp_tpu.config  # noqa: F401  (matmul precision, cache)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    block = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    reps = int(os.environ.get("REPS", 8))
    dt = jnp.float32

    rng = np.random.default_rng(0)

    def spd(m, i):
        a = rng.standard_normal((m, m)).astype(np.float32)
        k = a @ a.T / m + (1.0 + 0.01 * i) * np.eye(m, dtype=np.float32)
        return jnp.asarray(k, dt)

    # dispatch floor: trivial jitted program
    triv = jax.jit(lambda x: x + 1.0)
    xs_small = [jnp.ones((8, 128), dt) * i for i in range(reps)]
    disp = _bench(lambda x: triv(x), [(x,) for x in xs_small])
    print(f"dispatch floor: {disp*1e3:.2f} ms")

    flops = n ** 3 / 3

    # 1. stock cholesky
    Ks = [spd(n, i) for i in range(min(reps, 4))]
    stock = jax.jit(jnp.linalg.cholesky)
    t = _bench(lambda K: stock(K), [(K,) for K in Ks], reps) - disp
    print(f"stock chol      N={n}: {t*1e3:8.2f} ms  {flops/t/1e12:6.1f} TFLOP/s")

    # 2. blocked cholesky (current default)
    from gp_tpu.ops.blocked import blocked_cholesky
    bl = jax.jit(lambda K: blocked_cholesky(K, block=block))
    t = _bench(lambda K: bl(K), [(K,) for K in Ks], reps) - disp
    print(f"blocked chol    N={n} B={block}: {t*1e3:8.2f} ms  "
          f"{flops/t/1e12:6.1f} TFLOP/s")

    # 3. trailing-update SYRK alone: (n-b, b) @ (b, n-b)
    m = n - block
    pans = [jnp.asarray(rng.standard_normal((m, block)), dt)
            for _ in range(min(reps, 4))]
    syrk = jax.jit(lambda p: p @ p.T)
    t = _bench(lambda p: syrk(p), [(p,) for p in pans], reps) - disp
    sflops = 2 * m * m * block
    print(f"first SYRK      ({m}x{block})@({block}x{m}): {t*1e3:8.2f} ms  "
          f"{sflops/t/1e12:6.1f} TFLOP/s")

    # 4. panel TRSM alone: solve_triangular(Ljj, (b, n-b))
    from jax.scipy.linalg import solve_triangular
    Ljj = [jnp.linalg.cholesky(spd(block, i)) for i in range(2)]
    Bs = [jnp.asarray(rng.standard_normal((block, m)), dt) for _ in range(2)]
    tr = jax.jit(lambda L, B: solve_triangular(L, B, lower=True))
    t = _bench(lambda L, B: tr(L, B),
               [(Ljj[i % 2], Bs[i % 2]) for i in range(reps)], reps) - disp
    tflops = block * block * m  # triangular solve flops
    print(f"panel TRSM      ({block}x{block})\\({block}x{m}): {t*1e3:8.2f} ms  "
          f"{tflops/t/1e12:6.1f} TFLOP/s")

    # 5. base-case chol at base_block
    for bb in (256, 512):
        Kb = [spd(bb, i) for i in range(2)]
        t = _bench(lambda K: stock(K),
                   [(Kb[i % 2],) for i in range(reps)], reps) - disp
        print(f"base chol       N={bb}: {t*1e3:8.2f} ms")

    # 6. big matmul reference (the practical peak at this precision)
    As = [jnp.asarray(rng.standard_normal((n, n)), dt) for _ in range(2)]
    mm = jax.jit(lambda a: a @ a)
    t = _bench(lambda a: mm(a), [(As[i % 2],) for i in range(reps)], reps) - disp
    print(f"dense matmul    ({n}x{n})^2: {t*1e3:8.2f} ms  "
          f"{2*n**3/t/1e12:6.1f} TFLOP/s  <- practical peak")


if __name__ == "__main__":
    main()
