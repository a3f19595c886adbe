"""Device-trace category breakdown for the blocked Cholesky / full objective.

Traces a jitted program on the real chip with jax.profiler, converts the
xplane dump via xprof's hlo_stats tool, and prints per-HLO-category device
self-time — the measurement behind BASELINE.md's "MXU utilization"
tables ("dot share" = convolution-fusion self time / total device time).

Usage:
  python benchmarks/chol_trace.py chol [N [BLOCK]]     factorization only
  python benchmarks/chol_trace.py obj  [N]             fused NLL+gradient
"""

from __future__ import annotations

import collections
import glob
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def aggregate(logdir: str, runs: int):
    from xprof.convert import raw_to_tool_data

    paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    out, _ = raw_to_tool_data.xspace_to_tool_data(paths, "hlo_stats", {})
    d = json.loads(out.decode() if isinstance(out, bytes) else out)
    ci = {c["id"]: i for i, c in enumerate(d["cols"])}
    agg = collections.defaultdict(float)
    ops = collections.defaultdict(float)
    for row in d["rows"]:
        c = row["c"]
        cat = c[ci["category"]]["v"]
        t = float(c[ci["total_self_time"]]["v"])
        agg[cat] += t
        ops[(cat, c[ci["hlo_op_name"]]["v"][:44])] += t
    tot = sum(agg.values())
    print(f"device self time: {tot / runs / 1000:.2f} ms/run "
          f"({runs} traced runs)")
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1]):
        if v / tot > 0.002:
            print(f"  {k:32s} {v / runs / 1000:8.2f} ms  {100 * v / tot:5.1f}%")
    print("  top ops:")
    for (cat, op), v in sorted(ops.items(), key=lambda kv: -kv[1])[:10]:
        print(f"    {cat:24s} {op:44s} {v / runs / 1000:7.2f} ms")
    return agg, tot


def main():
    import jax
    import jax.numpy as jnp

    import gp_tpu.config  # noqa: F401
    from gp_tpu.ops.blocked import add_diag, blocked_cholesky

    mode = sys.argv[1] if len(sys.argv) > 1 else "chol"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    block = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    base_block = int(sys.argv[4]) if len(sys.argv) > 4 else 128
    runs = 3
    dt = jnp.float32
    key = jax.random.PRNGKey(0)

    if mode == "chol":
        # K is built INSIDE the traced program by the REAL fused SE build
        # (~0.6 ms at N=8192, visible as its own custom-call row) — a
        # prebuilt K0 input forces a full N^2 defensive copy before the
        # in-place factorization, and a synthetic a@a.T build costs 6x the
        # factorization's FLOPs, both of which poison the category shares
        from gp_tpu import SE_ARD
        from gp_tpu.ops.kernels import get_k_noise
        d = 10
        X = jax.random.uniform(key, (n, d), dt, -2.0, 2.0)
        chyp0 = jnp.zeros((d + 1,), dt)
        fn = jax.jit(lambda c, s2: jnp.sum(blocked_cholesky(
            get_k_noise(SE_ARD)(chyp0 + c, s2, X, n),
            block=block, base_block=base_block, zero_upper=False)))
        args = lambda i: (jnp.asarray(0.001 * i, dt),
                          jnp.asarray(0.05 + 0.001 * i, dt))
    elif mode == "obj":
        from gp_tpu import SE_ARD
        from gp_tpu.models import exact
        from gp_tpu.models.base import default_hyps
        d = 24
        X = jax.random.uniform(key, (n, d), dt, -2.0, 2.0)
        y = jnp.sin(2.0 * X[:, 0]) + 0.5 * X[:, 1]
        hyp0 = jnp.asarray(default_hyps(SE_ARD, np.asarray(X),
                                        np.asarray(y), 1e-3, False), dt)
        vg = jax.jit(lambda h: (lambda fg: fg[0] + jnp.sum(fg[1]))(
            exact.nll_vg_raw(SE_ARD, h, X, y)))
        fn = vg
        args = lambda i: (hyp0 + 0.001 * i,)
    else:
        raise SystemExit(f"unknown mode {mode}")

    v = float(np.asarray(fn(*args(0))))          # compile
    assert np.isfinite(v)
    logdir = tempfile.mkdtemp(prefix="gp_tpu_trace_")
    with jax.profiler.trace(logdir):
        for i in range(1, runs + 1):
            float(np.asarray(fn(*args(i))))
    print(f"[{mode} N={n} block={block} base={base_block}]"
          if mode == "chol" else f"[{mode} N={n}]")
    aggregate(logdir, runs)


if __name__ == "__main__":
    main()
