"""Host/device scaling-efficiency harness (BASELINE "1->2 hosts" metric).

The BASELINE north star asks for >=80% samples/s scaling efficiency going
from one v5e host to two.  This image exposes ONE chip through the axon
tunnel, so the pod-scale number cannot be measured here; this harness is
the ready-to-run measurement for when a slice is available, and doubles
as a functional strong-scaling check on the virtual CPU mesh.

Two modes:

  * single-process device sweep (default):
        python benchmarks/scaling.py [--n 16384] [--devices 1,2,4,8]
    Times the distributed fused NLL+gradient (parallel/pgp.pnll_vg —
    block-cyclic K, distributed Cholesky, psum'd terms) on meshes of
    1..k local devices and reports evals/s + efficiency vs 1 device.
    On the CPU backend this validates the program under real sharding
    but is NOT a performance statement (virtual devices share cores and
    XLA:CPU runs collectives through shared memory).

  * multi-process (one process per host, as on a pod):
        GP_TPU_COORD=host0:1234 GP_TPU_NPROC=2 GP_TPU_PID=<i> \
            python benchmarks/scaling.py --multiprocess
    Each process calls parallel.multihost.initialize() and joins the
    global mesh; process 0 prints the JSON line.  Efficiency vs the
    recorded single-host run = (evals/s @ k hosts) / (k * evals/s @ 1).

Measurement discipline per benchmarks/README.md: distinct perturbed hyps
per rep, scalar fetched inside the timed region, min-of-reps.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _time_pnll(mesh, X, y, reps=5):
    import jax
    import jax.numpy as jnp

    from gp_tpu import SE_ARD
    from gp_tpu.models.base import default_hyps
    from gp_tpu.parallel import pgp

    dt = jnp.float32                    # the TPU production dtype
    X = jnp.asarray(np.asarray(X), dt)
    mu, sd = float(np.mean(y)), float(np.std(y, ddof=1))
    y_std = jnp.asarray((np.asarray(y) - mu) / sd, dt)
    hyp0 = np.asarray(default_hyps(SE_ARD, np.asarray(X), y_std, 1e-3,
                                   False))
    rng = np.random.default_rng(0)
    hyps = [jnp.asarray(hyp0 + 0.01 * rng.standard_normal(hyp0.shape), dt)
            for _ in range(reps + 1)]

    def one(h):
        f, g = pgp.pnll_vg(SE_ARD, h, X, y_std, mesh)
        return float(np.asarray(f + jnp.sum(g)))

    one(hyps[0])                                   # compile
    ts = []
    for h in hyps[1:]:
        t0 = time.perf_counter()
        one(h)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def device_sweep(n, d, counts, reps):
    import jax

    from gp_tpu.parallel.mesh import make_mesh
    from synth import make_data

    X, y = make_data(n, d)
    base = None
    rows = []
    for k in counts:
        if k > len(jax.devices()):
            break
        mesh = make_mesh(k)
        t = _time_pnll(mesh, X, y, reps)
        eps = 1.0 / t
        if base is None:
            base = eps
        eff = eps / (base * k)
        rows.append({"devices": k, "evals_per_s": round(eps, 3),
                     "efficiency_vs_1dev": round(eff, 3)})
        print(json.dumps({"metric": f"pnll_vg_scaling_n{n}_d{d}",
                          "backend": jax.default_backend(), **rows[-1]}),
              flush=True)
    return rows


def multiprocess(n, d, reps):
    from gp_tpu.parallel import multihost
    from synth import make_data

    multihost.initialize(
        coordinator_address=os.environ.get("GP_TPU_COORD"),
        num_processes=int(os.environ["GP_TPU_NPROC"])
        if "GP_TPU_NPROC" in os.environ else None,
        process_id=int(os.environ["GP_TPU_PID"])
        if "GP_TPU_PID" in os.environ else None)
    import jax

    mesh = multihost.global_mesh()
    X, y = make_data(n, d)
    t = _time_pnll(mesh, X, y, reps)
    if jax.process_index() == 0:
        print(json.dumps({
            "metric": f"pnll_vg_multihost_n{n}_d{d}",
            "processes": jax.process_count(),
            "devices": len(jax.devices()),
            "evals_per_s": round(1.0 / t, 3),
            "backend": jax.default_backend()}), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--d", type=int, default=10)
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--multiprocess", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon plugin ignores "
                         "JAX_PLATFORMS; this sets jax_platforms in-process)")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    if args.multiprocess:
        multiprocess(args.n, args.d, args.reps)
    else:
        device_sweep(args.n, args.d,
                     [int(v) for v in args.devices.split(",")], args.reps)
