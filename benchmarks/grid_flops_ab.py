"""Measure the 2-D grid's gradient-FLOP overhead vs the 1-D layout
(VERDICT round-5 item 9: replace the asserted 1.33x with a number).

Runs the full NLL+gradient evaluation on the SAME 8 devices arranged as
a (2, 4) grid (pchol2d.pnll_vg2d) and as a 1-D ring (pgp.pnll_vg), on
the virtual CPU mesh in f64.  On CPU the collectives are shared-memory
copies, so the wall ratio isolates the arithmetic overhead — the SUMMA
W^T W's inability to slice the block-triangle statically under SPMD
(the per-device triangle boundary li*Pr + r >= lj*Pc + c depends on the
traced axis_index, so the einsum must cover the bounding rectangle).

Usage: python benchmarks/grid_flops_ab.py [N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from gp_tpu import SE_ARD
from gp_tpu.models.base import default_hyps
from gp_tpu.parallel import pchol2d, pgp
from gp_tpu.parallel.mesh import make_mesh


def run(n: int, d: int = 6, block: int = 256, reps: int = 3):
    rng = np.random.default_rng(0)
    X = rng.uniform(-2, 2, (n, d))
    y = np.sin(X[:, 0]) + 0.1 * rng.standard_normal(n)
    hyp = jnp.asarray(default_hyps(SE_ARD, X, y, 1e-3, False))
    hyp = hyp.at[-2].set(np.log(0.1))

    mesh1 = make_mesh(8, axis_name="rows")
    grid = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh2 = Mesh(grid, (pchol2d.AXR, pchol2d.AXC))

    def t(fn):
        fn()                                       # compile
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    f1 = g1 = f2 = g2 = None

    def run1():
        nonlocal f1, g1
        f1, g1 = pgp.pnll_vg(SE_ARD, hyp, X, y, mesh1, block=block)
        jax.block_until_ready((f1, g1))

    def run2():
        nonlocal f2, g2
        f2, g2 = pchol2d.pnll_vg2d(SE_ARD, hyp, X, y, mesh2, block=block)
        jax.block_until_ready((f2, g2))

    t1 = t(run1)
    t2 = t(run2)
    np.testing.assert_allclose(float(f2), float(f1), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=1e-6,
                               atol=1e-9)
    print(f"N={n} block={block}: 1-D {t1*1e3:.0f} ms, 2-D grid "
          f"{t2*1e3:.0f} ms -> measured overhead {t2/t1:.2f}x "
          f"(modeled FLOP ratio ~1.33x on the gradient terms)")
    return t1, t2


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    run(n)
