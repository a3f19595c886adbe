"""Large-N exact-GP demonstrations on the real chip (BASELINE configs).

  fit16k   — full MLE fit at N=16384, d=10 (synthetic, seed 42) on the
             default backend; writes the fitted hyps + final NLL to
             benchmarks/golden/tpu_fit_n16384.json.  Cross-check with
             `python benchmarks/ref_equiv.py eval-at-synth gp <json>`.
  eval50k  — measured NLL+analytic-gradient time at N=51200 (>=50k), d=10
             via the memory-streamed path (exact.nll_vg_streamed): the
             BASELINE "N=50k" config executed for real on ONE chip
             (K^-1 is never materialized; peak ~1.3 N^2 buffers).
  fit50k   — the full BASELINE N=50k config: 160-eval MLE fit at N=51200,
             d=10 on one chip (GP.train routes the streamed objective and
             the host-loop set_k above 32768 rows), plus a held-out
             prediction check; writes golden/tpu_fit_n51200.json.
             Cross-check: `ref_equiv.py eval-at-synth <json>`.

Usage: python benchmarks/big_fit.py fit16k|fit8k|eval50k|fit50k
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from synth import make_data  # noqa: E402  (benchmarks/ on path when run as file)


def fit16k(n=16384, d=10, kernel="se_ard"):
    import jax
    from gp_tpu import GP

    X, y = make_data(n, d)
    Xs, ys = make_data(2000, d, seed=7)
    gp = GP(X, y, kernel=kernel)
    t0 = time.perf_counter()
    nll = gp.train()
    wall = time.perf_counter() - t0
    mu = gp.batch_predict_y(Xs)
    rmse = float(np.sqrt(np.mean((np.asarray(mu).ravel() - ys) ** 2)))
    tag = "" if kernel == "se_ard" else f"_{kernel}"
    out = {
        "metric": f"tpu_exact_fit_n{n}_d{d}{tag}",
        "value": round(wall, 1), "unit": "s (incl. compile)",
        "final_nll": float(nll), "heldout_rmse": round(rmse, 4),
        "kernel": kernel,
        "backend": jax.default_backend(),
        "seed": 42,
        "hyp": [float(v) for v in gp.get_hyp()],
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "golden", f"tpu_fit_n{n}{tag}.json")
    json.dump(out, open(path, "w"), indent=1)
    print(json.dumps(out))
    return out


def fit8k():
    """Full `gp 8000` MLE fit on the bundled data (the reference driver's
    default workload) — records hyps for the one-eval CPU-oracle parity
    check (`python benchmarks/ref_equiv.py eval-at gp <json> 8000`)."""
    import jax
    from gp_tpu import GP
    from gp_tpu.utils.io import read_matrix

    ref = "/root/reference/data"
    X = read_matrix(os.path.join(ref, "train_x"))[:8000]
    y = read_matrix(os.path.join(ref, "train_y"))[:8000].ravel()
    Xs = read_matrix(os.path.join(ref, "test_x"))
    ty = read_matrix(os.path.join(ref, "test_y")).ravel()
    gp = GP(X, y)
    t0 = time.perf_counter()
    nll = gp.train()
    wall = time.perf_counter() - t0
    mu = gp.batch_predict_y(Xs)
    rmse = float(np.sqrt(np.mean((np.asarray(mu).ravel() - ty) ** 2)))
    out = {
        "metric": "tpu_exact_fit_n8000_d24",
        "value": round(wall, 1), "unit": "s (incl. compile)",
        "final_nll": float(nll), "heldout_rmse": round(rmse, 3),
        "backend": jax.default_backend(),
        "hyp": [float(v) for v in gp.get_hyp()],
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "golden", "tpu_fit_n8000.json")
    json.dump(out, open(path, "w"), indent=1)
    print(json.dumps(out))
    return out


def fit50k(n=51200, d=10, warm=False):
    """The BASELINE N=50k exact-GP config, for real: full MLE fit + predict
    on one chip.  Held-out points come from the same generator at a
    different seed (the targets share the noiseless function).

    warm=True first fits an 8192-point random subset (~1 min on the chip:
    160 evals x ~0.4 s) and starts the full-N optimization from those
    hyps.  Rationale: at this N the default-hyp probe is INF (f32 non-SPD
    at the tiny default noise), so a cold start enters via the random
    global search (GP.cpp:196-198 semantics) and 160 evals can stall in
    the noise-dominated basin (measured: final NLL +1.04 nats/pt vs -0.2
    at N=16384).  Subset MLE lands in the data-fit basin first — the
    large-N analog the serial reference cannot afford.
    """
    import jax
    from gp_tpu import GP

    X, y = make_data(n, d)
    Xs_all, ys_all = make_data(2000, d, seed=7)
    gp = GP(X, y)
    init = None
    warm_wall = 0.0
    if warm:
        t0 = time.perf_counter()
        # the library method also clamps the start noise (a subset MLE
        # overfits noise to the noise_lb clip, which is catastrophic at
        # full N — measured +185677 nats unclamped vs -27616 clamped at
        # the same length scales; a start that far out also exhausts the
        # 160-eval budget before reaching the basin, stalling at the
        # +53k noise basin twice)
        init = np.asarray(gp.subset_init_hyps(m=8192, seed=1))
        warm_wall = time.perf_counter() - t0
        print(json.dumps({"warm_start_log_sn": float(init[-2]),
                          "warm_wall_s": round(warm_wall, 1)}), flush=True)
        # free any leftover device buffers: the HBM-scale posterior-cache
        # program below fits the 16 GB chip with very little slack — a
        # leftover ~0.5 GB was a measured RESOURCE_EXHAUSTED
        import gc
        gc.collect()
    t0 = time.perf_counter()
    def _safe(fn):
        # after a RESOURCE_EXHAUSTED, even small device fetches can fail;
        # every field of the partial record must be independently optional
        # (the first crash lost an hour-long fit to repr() of a device
        # array inside this very handler)
        try:
            return fn()
        except Exception as ex:   # noqa: BLE001
            return f"unavailable: {ex!r}"

    tag = "_warm" if warm else ""
    try:
        nll = gp.train(init) if init is not None else gp.train()
    except Exception as e:
        # train() stores the fitted hyps BEFORE the posterior cache; an
        # OOM/watchdog failure there must not lose the hour-long fit
        res = gp.last_opt_result
        part = {"metric": f"tpu_exact_fit_n{n}_d{d}{tag}_PARTIAL",
                "error": repr(e), "seed": 42,
                "hyp": _safe(lambda: [float(v) for v in
                                      np.asarray(gp.get_hyp())]),
                "opt_f": _safe(lambda: float(res.f)) if res else None,
                "opt_evals": _safe(lambda: int(res.evals)) if res else None,
                # hosted-optimizer fields are numpy: recoverable even when
                # the device is dead (hyp = unstandardize(opt_x_std))
                "opt_x_std": _safe(lambda: [float(v) for v in
                                            np.asarray(res.x)]) if res
                             else None,
                "y_mu": _safe(lambda: gp._y_mu),
                "y_sigma": _safe(lambda: gp._y_sigma)}
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "golden", f"tpu_fit_n{n}{tag}_partial.json")
        json.dump(part, open(path, "w"), indent=1)
        print(json.dumps(part), flush=True)
        raise
    wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    mu = gp.batch_predict_y(Xs_all)
    pred_wall = time.perf_counter() - t0
    rmse = float(np.sqrt(np.mean((np.asarray(mu).ravel() - ys_all) ** 2)))
    res = gp.last_opt_result
    out = {
        "metric": f"tpu_exact_fit_n{n}_d{d}{tag}",
        "value": round(wall, 1), "unit": "s (incl. compile)",
        "final_nll": float(nll), "heldout_rmse": round(rmse, 4),
        "predict_2000_s": round(pred_wall, 2),
        "backend": jax.default_backend(), "seed": 42,
        "warm_start_wall_s": round(warm_wall, 1) if warm else None,
        "warm_start_hyp": ([float(v) for v in init]
                           if init is not None else None),
        # the optimizer's OWN endpoint (original-units f; x in the
        # standardized optimization space) — diagnosable independently of
        # any later posterior-cache noise inflation (set_k mutates hyps)
        "opt_f": float(res.f) if res is not None else None,
        "opt_evals": int(res.evals) if res is not None else None,
        "hyp": [float(v) for v in gp.get_hyp()],
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "golden", f"tpu_fit_n{n}{tag}.json")
    json.dump(out, open(path, "w"), indent=1)
    print(json.dumps(out))
    return out


def eval50k(n=51200, d=10, tile=2048, reps=3):
    import jax
    import jax.numpy as jnp

    from gp_tpu import SE_ARD
    from gp_tpu.models import exact
    from gp_tpu.models.base import default_hyps

    X, y = make_data(n, d)
    dt = jnp.float32 if jax.default_backend() == "tpu" else jnp.float64
    x_d = jnp.asarray(X, dt)
    # standardized targets (the f32 objective contract, models/base.py)
    mu, sd = float(np.mean(y)), float(np.std(y, ddof=1))
    y_d = jnp.asarray((y - mu) / sd, dt)
    hyp0 = np.asarray(default_hyps(SE_ARD, X, (y - mu) / sd, 1e-3, False))
    # the default noise (std(y)*1e-3)^2 ~ 1e-6 makes K legitimately
    # non-SPD in f32 at this N (the fit path rescues via multistart;
    # GP.cpp:196-198) — time at a representative feasible noise instead
    hyp0[-2] = np.log(0.05)

    fn = jax.jit(lambda h: (lambda fg: (fg[0], jnp.sum(fg[1])))(
        exact.nll_vg_streamed(SE_ARD, h, x_d, y_d, tile=tile)))

    rng = np.random.default_rng(0)
    hyps = [jnp.asarray(hyp0 + 0.01 * rng.standard_normal(hyp0.shape), dt)
            for _ in range(reps + 1)]
    t0 = time.perf_counter()
    f0, gs = fn(hyps[0])
    f0 = float(np.asarray(f0)) + float(np.asarray(gs))
    compile_s = time.perf_counter() - t0
    assert np.isfinite(f0), "first evaluation non-finite"

    ts = []
    for h in hyps[1:]:
        t0 = time.perf_counter()
        f, gs = fn(h)
        v = float(np.asarray(f)) + float(np.asarray(gs))
        ts.append(time.perf_counter() - t0)
        assert np.isfinite(v)
    out = {
        "metric": f"tpu_exact_nll_grad_s_n{n}_d{d}",
        "value": round(min(ts), 2), "unit": "s/eval",
        "tile": tile, "dtype": jnp.dtype(dt).name,
        "backend": jax.default_backend(),
        "first_call_incl_compile_s": round(compile_s, 1),
        "seed": 42,
    }
    print(json.dumps(out))
    return out


def sparse100k(model_name="fitc", n=102400, m=512, d=10, init_from=None):
    """Full FITC/VFE MLE fit at the BASELINE sparse config (N=100k+,
    M=512) on one chip: the O(N M^2) regime the sparse models exist for,
    at an N the exact path cannot hold.  Inducing = the LAST m training
    rows (the reference drivers' rightCols convention, test_fitc.cpp:36).
    Oracle cross-check: `ref_equiv.py eval-at-synth-sparse <json>`."""
    import jax
    from gp_tpu import FITC, VFE

    X, y = make_data(n, d)
    Xs, ys = make_data(2000, d, seed=7)
    model = (FITC if model_name == "fitc" else VFE)(X, y)
    model.set_inducing(X[-m:])
    init = None
    if init_from is not None:
        # informed init from a recorded fit (e.g. the exact-GP hyps):
        # the VFE bound's noise-only basin traps L-BFGS from the default
        # init even when the data-fit basin is far better (round-5 f64
        # check: -26961 vs +65817 at N=51200/M=1024) — exactly the
        # multistart/MVMO scenario; sparse hyp layout equals the exact
        # layout for SE-ARD (cov..., log sn, mean)
        init = json.load(open(init_from))["hyp"]
    t0 = time.perf_counter()
    nll = model.train(init_hyps=init)
    wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    mu = model.batch_predict_y(Xs)
    pred_wall = time.perf_counter() - t0
    rmse = float(np.sqrt(np.mean((np.asarray(mu).ravel() - ys) ** 2)))
    tag = "_init" if init_from is not None else ""
    out = {
        "metric": f"tpu_{model_name}_fit_n{n}_m{m}_d{d}{tag}",
        "value": round(wall, 1), "unit": "s (incl. compile)",
        "final_nll": float(nll), "heldout_rmse": round(rmse, 4),
        "predict_2000_s": round(pred_wall, 2),
        "backend": jax.default_backend(), "seed": 42,
        "hyp": [float(v) for v in model.get_hyp()],
        "inducing": "last_m_rows",
    }
    if init_from is not None:
        out["init_from"] = os.path.basename(init_from)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "golden", f"tpu_{model_name}_n{n}_m{m}{tag}.json")
    json.dump(out, open(path, "w"), indent=1)
    print(json.dumps(out))
    return out


def dist_fit(n=16384, d=10):
    """GP.train_distributed executed ON the real chip (1-device "rows"
    mesh): the full distributed pipeline — block-cyclic sharded K,
    distributed blocked Cholesky, streamed psum_scatter gradient, hosted
    watchdog-safe optimizer, distributed posterior + predict — running on
    TPU hardware rather than the virtual CPU mesh.  On one device the
    collectives are trivial, but every shard_map program, layout and
    rescue path is the real code the pod runs."""
    import jax
    from jax.sharding import Mesh

    from gp_tpu import GP

    X, y = make_data(n, d)
    Xs, ys = make_data(2000, d, seed=7)
    mesh = Mesh(np.array(jax.devices()[:1]), ("rows",))
    gp = GP(X, y)
    t0 = time.perf_counter()
    nll = gp.train_distributed(mesh)
    wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    mu, s2 = gp.batch_predict(Xs)
    pred_wall = time.perf_counter() - t0
    rmse = float(np.sqrt(np.mean((np.asarray(mu).ravel() - ys) ** 2)))
    out = {
        "metric": f"tpu_dist_fit_1dev_n{n}_d{d}",
        "value": round(wall, 1), "unit": "s (incl. compile)",
        "final_nll": float(nll), "heldout_rmse": round(rmse, 4),
        "predict_2000_s": round(pred_wall, 2),
        "opt_evals": int(gp.last_opt_result.evals),
        "backend": jax.default_backend(), "seed": 42,
        "hyp": [float(v) for v in gp.get_hyp()],
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "golden", f"tpu_dist_fit_n{n}.json")
    json.dump(out, open(path, "w"), indent=1)
    print(json.dumps(out))
    return out


def grid_fit(n=16384, d=10):
    """GP.train_distributed on a (1, 1) ("rowg", "colg") grid mesh ON the
    real chip — the 2-D analog of dist_fit: every grid program
    (pchol2d_local lookahead factorization, grid solves, pset_k2d rescue,
    ppredict2d serving, grid-native final NLL) is the REAL pod code
    executing on TPU hardware; only the collectives are trivial at
    Pr=Pc=1."""
    import jax
    from jax.sharding import Mesh

    from gp_tpu import GP
    from gp_tpu.parallel import pchol2d

    X, y = make_data(n, d)
    Xs, ys = make_data(2000, d, seed=7)
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1),
                (pchol2d.AXR, pchol2d.AXC))
    gp = GP(X, y)
    t0 = time.perf_counter()
    nll = gp.train_distributed(mesh)
    wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    mu, s2 = gp.batch_predict(Xs)
    pred_wall = time.perf_counter() - t0
    rmse = float(np.sqrt(np.mean((np.asarray(mu).ravel() - ys) ** 2)))
    out = {
        "metric": f"tpu_grid_fit_1x1_n{n}_d{d}",
        "value": round(wall, 1), "unit": "s (incl. compile)",
        "final_nll": float(nll), "heldout_rmse": round(rmse, 4),
        "predict_2000_s": round(pred_wall, 2),
        "opt_evals": int(gp.last_opt_result.evals),
        "backend": jax.default_backend(), "seed": 42,
        "hyp": [float(v) for v in gp.get_hyp()],
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "golden", f"tpu_grid_fit_n{n}.json")
    json.dump(out, open(path, "w"), indent=1)
    print(json.dumps(out))
    return out


def refine(hyp_path):
    """Recompute the chip NLL at a recorded optimum via exact.nll_refined
    (f32 MXU factor + iterative-refinement data fit + stochastically
    corrected logdet) and store it in the record — the number to compare
    against `ref_equiv.py eval-at-synth`'s f64 oracle value."""
    import jax
    import jax.numpy as jnp
    from gp_tpu import SE_ARD
    from gp_tpu.models import exact

    rec = json.load(open(hyp_path))
    n = int(rec["metric"].split("_n")[-1].split("_")[0])
    d = int(rec["metric"].split("_d")[-1].split("_")[0])
    X, y = make_data(n, d, seed=rec.get("seed", 42))
    dt = jnp.float32 if jax.default_backend() == "tpu" else jnp.float64
    hyp = jnp.asarray(rec["hyp"], dt)
    t0 = time.perf_counter()
    v = float(exact.nll_refined(SE_ARD, hyp, jnp.asarray(X, dt),
                                jnp.asarray(y, dt)))
    wall = time.perf_counter() - t0
    rec["final_nll_refined"] = v
    json.dump(rec, open(hyp_path, "w"), indent=1)
    print(json.dumps({"metric": f"tpu_nll_refined_n{n}", "value": v,
                      "plain_f32_nll": rec.get("final_nll"),
                      "wall_s_incl_compile": round(wall, 1)}))


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "eval50k"
    if cmd == "fit16k":
        fit16k()
    elif cmd == "fit16k-matern52":
        # round 5: the extra kernel family at chip scale on the fused
        # Pallas build path (pin: test_golden_tpu_fits matern record)
        fit16k(kernel="matern52")
    elif cmd == "fit8k":
        fit8k()
    elif cmd == "eval50k":
        eval50k()
    elif cmd == "fit50k":
        fit50k()
    elif cmd == "fit50k-warm":
        fit50k(warm=True)
    elif cmd == "fitc100k":
        sparse100k("fitc")
    elif cmd == "vfe100k":
        sparse100k("vfe")
    elif cmd == "vfe100k-m1024":
        # round 5: the capacity counterpart of the M=512 degeneracy
        # record.  MEASURED WALL on this image: the N=102400 x M=1024
        # f64 program crashes the remote tpu_compile_helper (HTTP 500,
        # reproduced twice), while N=51200/M=1024 and N=102400/M=768
        # both compile and run — the honest ceiling is the helper, not
        # the 6.7 GiB HBM envelope.  See vfe100k-m768.
        sparse100k("vfe", m=1024)
    elif cmd == "vfe100k-m768":
        # N=102400, M=768: the VALUE program compiles and runs, but the
        # first NLL+GRADIENT evaluation dies RESOURCE_EXHAUSTED (AD peak
        # of the f64 (N, M) algebra exceeds the chip; measured round 5).
        # A jax.checkpoint-wrapped gradient was also probed: its compile
        # crashes the remote helper (HTTP 500) like the M=1024 value
        # program — the N=102400 gradient is walled on this image either
        # way; the capacity record lives at N=51200/M=1024.
        sparse100k("vfe", m=768)
    elif cmd == "vfe50k-m1024":
        # round 5: the VFE capacity record that RUNS on one chip —
        # N=51200 (the exact-GP headline N) with M=1024: double the
        # M=512 capacity whose N=102400 record is degenerate.  The
        # N=102400 twins are measured walls: M=1024 crashes the remote
        # compile helper (HTTP 500 twice), M=768 OOMs in the gradient.
        sparse100k("vfe", n=51200, m=1024)
    elif cmd == "vfe50k-m1024-init":
        # same config, initialized from the recorded exact-GP fit: the
        # default init lands in the noise-only basin although the
        # data-fit basin is far lower (see sparse100k docnote) — the
        # informed-init run is the capacity record
        sparse100k("vfe", n=51200, m=1024, init_from=os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "golden",
            "tpu_fit_n51200.json"))
    elif cmd == "dist-fit":
        dist_fit()
    elif cmd == "grid-fit":
        grid_fit()
    elif cmd == "refine":
        refine(sys.argv[2])
    else:
        raise SystemExit(f"unknown command {cmd}")
