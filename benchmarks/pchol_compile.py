"""Compile-time characterization of the distributed pipeline at target
shapes (VERDICT r1 weakness 6: the panel loops Python-unroll nb =
N/(P*block) steps; does trace+compile stay sane at N=50k..200k?).

Runs on the 8-virtual-device CPU mesh (compile timing only — the HLO is
backend-portable, and the unroll growth it measures is what hits the TPU
remote compiler too).

Usage: python benchmarks/pchol_compile.py [N ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    from gp_tpu import SE_ARD
    from gp_tpu.parallel import pgp
    from gp_tpu.parallel.mesh import make_mesh

    ns = [int(a) for a in sys.argv[1:]] or [50_000, 100_000, 200_000]
    block = int(os.environ.get("PCHOL_BLOCK", 256))
    mesh = make_mesh(8, "rows")
    n_dev = 8

    for n in ns:
        d = 10
        # tiny dtype footprint: we only trace/lower/compile, never run
        x = jnp.zeros((n, d), jnp.float32)
        y = jnp.zeros((n,), jnp.float32)
        x_pad, y_pad, n_real = pgp._pad_xy(x, y, n_dev, block)
        hyp = jnp.zeros((d + 3,), jnp.float32)
        nb = x_pad.shape[0] // (block * n_dev)

        t0 = time.perf_counter()
        lowered = pgp._pnll_program.lower(
            SE_ARD, hyp, x_pad, y_pad, n_real, n_dev, block, mesh)
        t_lower = time.perf_counter() - t0

        t0 = time.perf_counter()
        lowered.compile()
        t_compile = time.perf_counter() - t0

        print(json.dumps({
            "metric": f"pnll_vg_compile_s_n{n}_p8_b{block}",
            "value": round(t_lower + t_compile, 1), "unit": "s",
            "trace_lower_s": round(t_lower, 1),
            "compile_s": round(t_compile, 1),
            "panels_per_device": int(nb), "block": block,
        }), flush=True)


if __name__ == "__main__":
    main()
