"""Reference-equivalent CPU implementation (NumPy doubles, BLAS).

The C++ reference (Brightorange90/GP) cannot be built in this image (Eigen /
NLOPT absent, MVMO an empty submodule — SURVEY.md section 2.9), so golden
baselines come from this independent NumPy implementation of the SAME
algorithm: SE-ARD kernel + constant mean exact-GP NLL with the reference's
analytic gradient (GP.cpp:120-176), Cholesky via LAPACK dpotrf, L-BFGS-B
with the reference's 160-evaluation budget (GP.cpp:231-238).

NumPy doubles on BLAS are the faithful stand-in for the reference's Eigen
doubles with -march=native.  Usage:

    python benchmarks/ref_equiv.py time-eval   # per-(NLL+grad) seconds
    python benchmarks/ref_equiv.py train       # full 160-eval MLE fit
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import scipy.linalg as sla

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_DATA = "/root/reference/data"


def sqdist(a, b):
    return np.maximum(
        (a * a).sum(1)[:, None] + (b * b).sum(1)[None, :] - 2.0 * a @ b.T, 0.0)


def nll_and_grad(hyp, X, y):
    """Exact-GP NLL + analytic gradient, SE-ARD (GP.cpp:120-176).

    hyp = [log l_1..log l_d, log sf, log sn, mean].
    """
    n, d = X.shape
    ell = np.exp(hyp[:d])
    sf2 = np.exp(2.0 * hyp[d])
    sn2 = np.exp(2.0 * hyp[d + 1])
    mean = hyp[d + 2]

    Xs = X / ell
    D = sqdist(Xs, Xs)
    K0 = sf2 * np.exp(-0.5 * D)
    K = K0 + sn2 * np.eye(n)

    L = sla.cholesky(K, lower=True)
    r = y - mean
    alpha = sla.cho_solve((L, True), r)
    nll = (0.5 * r @ alpha + np.log(np.diag(L)).sum()
           + 0.5 * n * np.log(2 * np.pi))

    Kinv = sla.cho_solve((L, True), np.eye(n))
    Q = Kinv - np.outer(alpha, alpha)
    QK = Q * K0

    g = np.empty_like(hyp)
    # d K0 / d log l_i = K0 * (x_i - x'_i)^2 / l_i^2
    for i in range(d):
        Di = sqdist(X[:, i:i + 1] / ell[i], X[:, i:i + 1] / ell[i])
        g[i] = 0.5 * (QK * Di).sum()
    g[d] = QK.sum()                       # dK0/dlog sf = 2 K0
    g[d + 1] = sn2 * np.trace(Q)
    g[d + 2] = -alpha.sum()
    return nll, g


# --------------------------------------------------------------------------
# Sparse-model oracles (FITC.cpp:201-319, VFE.cpp:161-249)
#
# Forward NLLs are straight NumPy-f64 transcriptions of the reference
# algebra (no clamps, no standardization — original units, exactly as the
# C++ computes).  Gradients come from torch-CPU autograd over an
# independent torch-f64 implementation of the same objective: a different
# AD engine and a different BLAS than both the JAX library under test and
# the NumPy forward, cross-checked against the NumPy value at every call.
# --------------------------------------------------------------------------

def _se_ard(hyp_cov, a, b):
    """SE-ARD kernel matrix (CovSEard.cpp:7-11), hyp_cov=[log l.., log sf]."""
    d = a.shape[1]
    ell = np.exp(hyp_cov[:d])
    sf2 = np.exp(2.0 * hyp_cov[d])
    return sf2 * np.exp(-0.5 * sqdist(a / ell, b / ell))


def fitc_nll(hyp, X, y, U, jitter):
    """FITC NLL (FITC.cpp:201-228).  hyp=[log l.., log sf, log sn, mean]."""
    n, d = X.shape
    m = U.shape[0]
    sn2 = np.exp(2.0 * hyp[d + 1])
    sf2 = np.exp(2.0 * hyp[d])
    r = y - hyp[d + 2]

    Kuu = _se_ard(hyp, U, U) + jitter * np.eye(m)
    Kxu = _se_ard(hyp, X, U)
    Luu = sla.cholesky(Kuu, lower=True)
    V = sla.solve_triangular(Luu, Kxu.T, lower=True)          # (M, N)
    qdiag = (V * V).sum(0)
    gamma = (sn2 + sf2 - qdiag) / sn2                          # FITC.cpp:215
    A = sn2 * Kuu + (Kxu.T / gamma) @ Kxu                      # FITC.cpp:217
    LA = sla.cholesky(A, lower=True)
    t1 = Kxu.T @ (r / gamma)
    fit = (r / gamma) @ (r - Kxu @ sla.cho_solve((LA, True), t1)) / sn2
    logdet = (2.0 * np.log(np.diag(LA)).sum()
              - 2.0 * np.log(np.diag(Luu)).sum()
              + np.log(gamma).sum() + (n - m) * np.log(sn2))
    return 0.5 * (fit + logdet + n * np.log(2 * np.pi))


def vfe_nll(hyp, X, y, U, jitter):
    """VFE NLL (VFE.cpp:161-189)."""
    n, d = X.shape
    m = U.shape[0]
    sn2 = np.exp(2.0 * hyp[d + 1])
    sf2 = np.exp(2.0 * hyp[d])
    r = y - hyp[d + 2]

    Kuu = _se_ard(hyp, U, U) + jitter * np.eye(m)
    Kxu = _se_ard(hyp, X, U)
    A = sn2 * Kuu + Kxu.T @ Kxu                                # VFE.cpp:174
    Luu = sla.cholesky(Kuu, lower=True)
    LA = sla.cholesky(A, lower=True)
    alpha = (r - Kxu @ sla.cho_solve((LA, True), Kxu.T @ r)) / sn2
    V = sla.solve_triangular(Luu, Kxu.T, lower=True)
    trace_term = (n * sf2 - (V * V).sum()) / sn2               # VFE.cpp:185-188
    return (0.5 * (n * np.log(2 * np.pi)
                   + 2.0 * np.log(np.diag(LA)).sum()
                   - 2.0 * np.log(np.diag(Luu)).sum()
                   + (n - m) * np.log(sn2) + r @ alpha)
            + 0.5 * trace_term)


def _sparse_nll_torch(model, hyp_t, X_t, y_t, U_t, jitter):
    """The same objectives in torch f64 (autograd supplies the gradient)."""
    import torch

    n, d = X_t.shape
    m = U_t.shape[0]
    ell = torch.exp(hyp_t[:d])
    sf2 = torch.exp(2.0 * hyp_t[d])
    sn2 = torch.exp(2.0 * hyp_t[d + 1])
    r = y_t - hyp_t[d + 2]

    def k(a, b):
        asc, bsc = a / ell, b / ell
        d2 = ((asc * asc).sum(1)[:, None] + (bsc * bsc).sum(1)[None, :]
              - 2.0 * asc @ bsc.T).clamp_min(0.0)
        return sf2 * torch.exp(-0.5 * d2)

    eye_m = torch.eye(m, dtype=X_t.dtype)
    Kuu = k(U_t, U_t) + jitter * eye_m
    Kxu = k(X_t, U_t)
    Luu = torch.linalg.cholesky(Kuu)
    log_2pi = float(np.log(2.0 * np.pi))

    if model == "fitc":
        V = torch.linalg.solve_triangular(Luu, Kxu.T, upper=False)
        qdiag = (V * V).sum(0)
        gamma = (sn2 + sf2 - qdiag) / sn2
        A = sn2 * Kuu + (Kxu.T / gamma) @ Kxu
        LA = torch.linalg.cholesky(A)
        t1 = Kxu.T @ (r / gamma)
        fit = (r / gamma) @ (r - Kxu @ torch.cholesky_solve(
            t1[:, None], LA)[:, 0]) / sn2
        logdet = (2.0 * torch.log(torch.diagonal(LA)).sum()
                  - 2.0 * torch.log(torch.diagonal(Luu)).sum()
                  + torch.log(gamma).sum() + (n - m) * torch.log(sn2))
        return 0.5 * (fit + logdet + n * log_2pi)
    else:  # vfe
        A = sn2 * Kuu + Kxu.T @ Kxu
        LA = torch.linalg.cholesky(A)
        alpha = (r - Kxu @ torch.cholesky_solve(
            (Kxu.T @ r)[:, None], LA)[:, 0]) / sn2
        V = torch.linalg.solve_triangular(Luu, Kxu.T, upper=False)
        trace_term = (n * sf2 - (V * V).sum()) / sn2
        return (0.5 * (n * log_2pi
                       + 2.0 * torch.log(torch.diagonal(LA)).sum()
                       - 2.0 * torch.log(torch.diagonal(Luu)).sum()
                       + (n - m) * torch.log(sn2) + r @ alpha)
                + 0.5 * trace_term)


def sparse_nll_and_grad(model, hyp, X, y, U, jitter, check=True):
    """(NLL, grad) for 'fitc'/'vfe' — torch autograd, NumPy cross-check.

    Non-SPD / non-finite evaluations return INF with a zero gradient,
    mirroring the reference's objective sanitization (GP.cpp:147-171:
    any failure or non-finite value/gradient -> INF)."""
    import torch

    hyp_t = torch.tensor(hyp, dtype=torch.float64, requires_grad=True)
    X_t = torch.tensor(X, dtype=torch.float64)
    y_t = torch.tensor(y, dtype=torch.float64)
    U_t = torch.tensor(U, dtype=torch.float64)
    try:
        f = _sparse_nll_torch(model, hyp_t, X_t, y_t, U_t, jitter)
        (g,) = torch.autograd.grad(f, hyp_t)
        f = float(f.detach())
        g = g.numpy()
    except (torch._C._LinAlgError, RuntimeError):
        return np.inf, np.zeros_like(hyp)
    if not (np.isfinite(f) and np.all(np.isfinite(g))):
        return np.inf, np.zeros_like(hyp)
    if check:
        ref = (fitc_nll if model == "fitc" else vfe_nll)(hyp, X, y, U, jitter)
        rel = abs(f - ref) / max(abs(ref), 1.0)
        assert rel < 1e-6, (f, ref, rel)
    return f, g


def default_hyps(X, y, noise_lb=1e-3):
    d = X.shape[1]
    hyp = np.empty(d + 3)
    hyp[:d] = np.log(np.std(X, axis=0, ddof=1))
    hyp[d] = np.log(np.std(y, ddof=1))
    hyp[d + 1] = max(np.log(noise_lb), np.log(np.std(y, ddof=1) * 1e-3))
    hyp[d + 2] = y.mean()
    return hyp


def load(n=8000):
    from gp_tpu.utils.io import read_matrix
    X = read_matrix(os.path.join(REF_DATA, "train_x"))[:n]
    y = read_matrix(os.path.join(REF_DATA, "train_y"))[:n].ravel()
    return X, y


def time_eval(n=8000, reps=3):
    X, y = load(n)
    hyp = default_hyps(X, y)
    nll_and_grad(hyp, X, y)            # warm BLAS
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        nll, _ = nll_and_grad(hyp, X, y)
        ts.append(time.perf_counter() - t0)
    out = {"metric": f"cpu_ref_equiv_nll_grad_s_n{n}", "value": min(ts),
           "unit": "s", "nll_at_default": float(nll)}
    print(json.dumps(out))
    return out


def train(n=8000, max_eval=160):
    from scipy.optimize import minimize
    from gp_tpu.models.base import hyp_range
    from gp_tpu import SE_ARD

    X, y = load(n)
    hyp0 = default_hyps(X, y)
    lb, ub = hyp_range(SE_ARD, X, y, 1e-3)
    bounds = [(l if np.isfinite(l) else None, u if np.isfinite(u) else None)
              for l, u in zip(lb, ub)]
    t0 = time.perf_counter()
    res = minimize(nll_and_grad, np.clip(hyp0, lb, ub), args=(X, y),
                   jac=True, method="L-BFGS-B", bounds=bounds,
                   options={"maxfun": max_eval})
    dt = time.perf_counter() - t0
    out = {"metric": f"cpu_ref_equiv_train_s_n{n}", "value": dt, "unit": "s",
           "final_nll": float(res.fun), "nfev": int(res.nfev),
           "hyp": [float(v) for v in res.x]}
    print(json.dumps(out))
    return out


def train_sparse(model, n=8000, m=512, max_eval=None, noise_lb=1e-3):
    """Full golden MLE fit of the FITC/VFE oracle — the reference drivers'
    exact configuration (test_fitc.cpp:11-60 / test_vfe.cpp:12-64):
    inducing = rightCols(m) of the FULL train matrix, jitter=(0.1*noise_lb)^2,
    VFE noise init log std(y), eval budgets 130/150."""
    from scipy.optimize import minimize
    from gp_tpu.models.base import hyp_range
    from gp_tpu import SE_ARD
    from gp_tpu.utils.io import read_matrix

    X, y = load(n)
    U = read_matrix(os.path.join(REF_DATA, "train_x"))[-m:]
    jitter = (0.1 * noise_lb) ** 2                     # FITC.cpp:27-31
    hyp0 = default_hyps(X, y, noise_lb)
    if model == "vfe":
        hyp0[-2] = np.log(np.std(y, ddof=1))           # test_vfe.cpp:39
    lb, ub = hyp_range(SE_ARD, X, y, noise_lb)
    bounds = [(l if np.isfinite(l) else None, u if np.isfinite(u) else None)
              for l, u in zip(lb, ub)]
    max_eval = max_eval or (130 if model == "fitc" else 150)

    t0 = time.perf_counter()
    res = minimize(lambda h: sparse_nll_and_grad(model, h, X, y, U, jitter),
                   np.clip(hyp0, lb, ub), jac=True, method="L-BFGS-B",
                   bounds=bounds,
                   options={"maxfun": max_eval, "ftol": 1e-12, "gtol": 1e-8})
    dt = time.perf_counter() - t0
    nll_default, _ = sparse_nll_and_grad(model, np.clip(hyp0, lb, ub),
                                         X, y, U, jitter)
    out = {"metric": f"cpu_ref_equiv_{model}_train_s_n{n}_m{m}",
           "value": dt, "unit": "s", "final_nll": float(res.fun),
           "nll_at_default": float(nll_default), "nfev": int(res.nfev),
           "jitter": jitter, "hyp": [float(v) for v in res.x]}
    print(json.dumps(out))
    return out


def gp_nll(hyp, X, y):
    """Exact-GP NLL only (no O(N^3) explicit inverse) — for large-N
    one-eval parity checks.

    Memory-lean on purpose: at N=51200 a f64 K is 21 GB, so everything
    (sqdist, exp, noise, Cholesky) happens in ONE buffer — same math as
    sqdist()+dense build, just with out= / overwrite_a."""
    n, d = X.shape
    ell = np.exp(hyp[:d])
    sf2 = np.exp(2.0 * hyp[d])
    sn2 = np.exp(2.0 * hyp[d + 1])
    Xs = X / ell
    if n * n < 2**31:
        K = Xs @ Xs.T                               # one N^2 buffer
    else:
        # one DGEMM with >2^31 output elements silently corrupts (or
        # segfaults) in this LP64 OpenBLAS — build the Gram matrix in
        # 8192-row panels so every BLAS call stays in int32 index space
        K = np.empty((n, n), np.float64)
        for p0 in range(0, n, 8192):
            p1 = min(p0 + 8192, n)
            K[p0:p1] = Xs[p0:p1] @ Xs.T
    sq = np.einsum("ij,ij->i", Xs, Xs)
    K *= -2.0
    K += sq[:, None]
    K += sq[None, :]
    np.maximum(K, 0.0, out=K)
    K *= -0.5
    np.exp(K, out=K)
    K *= sf2
    K.flat[:: n + 1] += sn2
    if n * n < 2**31:
        L = sla.cholesky(K, lower=True, overwrite_a=True, check_finite=False)
        r = y - hyp[d + 2]
        alpha = sla.cho_solve((L, True), r, check_finite=False)
    else:
        # this image's scipy OpenBLAS is LP64: any single dpotrf whose
        # lda*n exceeds 2^31 elements SEGFAULTS (measured at N=51200 —
        # the CPU analog of the XLA:TPU int32 fusion-addressing wall,
        # ops/slabbed.py).  Factor in-place with 8192-wide panels so every
        # BLAS call stays in int32 index space; K slabs are numpy views
        # (numpy itself indexes in 64-bit).
        L = _blocked_cholesky_inplace(K, block=8192)
        r = y - hyp[d + 2]
        z = _blocked_solve_lower(L, r.copy(), block=8192)
        alpha = _blocked_solve_lower_t(L, z, block=8192)
    return (0.5 * r @ alpha + np.log(np.diag(L)).sum()
            + 0.5 * n * np.log(2 * np.pi))


def _blocked_cholesky_inplace(K, block=8192):
    """Right-looking blocked dpotrf over the lower triangle of K, in place.

    Each panel is copied contiguous before its BLAS calls (lda == panel
    width), and the trailing SYRK runs column-slab by column-slab, so no
    LAPACK/BLAS call ever sees an index product near 2^31."""
    n = K.shape[0]
    for c0 in range(0, n, block):
        c1 = min(c0 + block, n)
        Ljj = sla.cholesky(np.ascontiguousarray(K[c0:c1, c0:c1]),
                           lower=True, check_finite=False)
        K[c0:c1, c0:c1] = Ljj
        if c1 < n:
            pan = np.ascontiguousarray(K[c1:, c0:c1])
            pan = sla.solve_triangular(Ljj, pan.T, lower=True,
                                       check_finite=False).T
            K[c1:, c0:c1] = pan
            for s0 in range(c1, n, block):
                s1 = min(s0 + block, n)
                K[s0:, s0:s1] -= pan[s0 - c1:] @ pan[s0 - c1:s1 - c1].T
    return K


def _blocked_solve_lower(L, b, block=8192):
    n = L.shape[0]
    for c0 in range(0, n, block):
        c1 = min(c0 + block, n)
        b[c0:c1] = sla.solve_triangular(
            np.ascontiguousarray(L[c0:c1, c0:c1]), b[c0:c1], lower=True,
            check_finite=False)
        if c1 < n:
            b[c1:] -= np.ascontiguousarray(L[c1:, c0:c1]) @ b[c0:c1]
    return b


def _blocked_solve_lower_t(L, b, block=8192):
    n = L.shape[0]
    starts = list(range(0, n, block))
    for c0 in reversed(starts):
        c1 = min(c0 + block, n)
        b[c0:c1] = sla.solve_triangular(
            np.ascontiguousarray(L[c0:c1, c0:c1]), b[c0:c1], lower=True,
            trans=1, check_finite=False)
        if c0 > 0:
            b[:c0] -= np.ascontiguousarray(L[c0:c1, :c0]).T @ b[c0:c1]
    return b


def eval_at_synth(hyp_path):
    """One f64 oracle NLL at TPU-fitted hyps on the synthetic large-N data
    (benchmarks/synth.py; n/d/seed read from the fit record)."""
    from synth import make_data

    rec = json.load(open(hyp_path))
    n = int(rec["metric"].split("_n")[-1].split("_")[0])
    d = int(rec["metric"].split("_d")[-1].split("_")[0])
    X, y = make_data(n, d, seed=rec.get("seed", 42))
    t0 = time.perf_counter()
    nll = gp_nll(np.asarray(rec["hyp"], np.float64), X, y)
    out = {"metric": f"cpu_ref_equiv_gp_nll_at_hyp_n{n}",
           "value": float(nll), "unit": "nll",
           "tpu_final_nll": rec.get("final_nll"),
           "oracle_wall_s": round(time.perf_counter() - t0, 1)}
    if rec.get("final_nll") is not None:
        # guarded: *_PARTIAL records (OOM mid-fit) carry hyps but no
        # final_nll — don't KeyError after the ~18-min oracle Cholesky
        out["rel_diff"] = (abs(float(nll) - rec["final_nll"])
                           / max(abs(rec["final_nll"]), 1.0))
    if rec.get("final_nll_refined") is not None:
        # the mixed-precision-repaired chip value (exact.nll_refined) —
        # the number the refinement claims should land within ~1 nat of
        # this f64 oracle at N~50k (vs ~50 nats for the plain f32 NLL)
        ref = float(rec["final_nll_refined"])
        out["tpu_final_nll_refined"] = ref
        out["refined_abs_diff_nats"] = abs(float(nll) - ref)
    print(json.dumps(out))
    return out


def eval_at_synth_sparse(hyp_path, noise_lb=1e-3):
    """f64 oracle NLL for a FITC/VFE fit record on the SYNTHETIC data
    (benchmarks/synth.py; n/m/d/seed from the record's metric string;
    inducing = last m training rows, the record's convention)."""
    from synth import make_data

    rec = json.load(open(hyp_path))
    parts = rec["metric"].split("_")
    model = parts[1]                       # tpu_{fitc|vfe}_fit_...
    n = int(rec["metric"].split("_n")[-1].split("_")[0])
    m = int(rec["metric"].split("_m")[-1].split("_")[0])
    d = int(rec["metric"].split("_d")[-1].split("_")[0])
    X, y = make_data(n, d, seed=rec.get("seed", 42))
    U = X[-m:]
    t0 = time.perf_counter()
    nll, _ = sparse_nll_and_grad(model, np.asarray(rec["hyp"], np.float64),
                                 X, y, U, (0.1 * noise_lb) ** 2)
    out = {"metric": f"cpu_ref_equiv_{model}_nll_at_hyp_n{n}_m{m}",
           "value": float(nll), "unit": "nll",
           "tpu_final_nll": rec.get("final_nll"),
           "oracle_wall_s": round(time.perf_counter() - t0, 1)}
    if rec.get("final_nll") is not None:
        out["rel_diff"] = (abs(float(nll) - rec["final_nll"])
                           / max(abs(rec["final_nll"]), 1.0))
    print(json.dumps(out))
    return out


def eval_at(model, hyp_path, n=8000, m=512, noise_lb=1e-3):
    """One oracle NLL evaluation at externally-fitted hyps (full-fit parity
    pinning: run the TPU CLI, then this at its optimum)."""
    from gp_tpu.utils.io import read_matrix

    hyp = np.asarray(json.load(open(hyp_path))["hyp"], np.float64)
    X, y = load(n)
    if model == "gp":
        nll, _ = nll_and_grad(hyp, X, y)
    else:
        U = read_matrix(os.path.join(REF_DATA, "train_x"))[-m:]
        nll, _ = sparse_nll_and_grad(model, hyp, X, y, U,
                                     (0.1 * noise_lb) ** 2)
    out = {"metric": f"cpu_ref_equiv_{model}_nll_at_hyp_n{n}",
           "value": float(nll), "unit": "nll"}
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "time-eval"
    if cmd == "time-eval":
        time_eval(int(sys.argv[2]) if len(sys.argv) > 2 else 8000)
    elif cmd == "train":
        train(int(sys.argv[2]) if len(sys.argv) > 2 else 8000)
    elif cmd in ("train-fitc", "train-vfe"):
        train_sparse(cmd[6:],
                     int(sys.argv[2]) if len(sys.argv) > 2 else 8000,
                     int(sys.argv[3]) if len(sys.argv) > 3 else 512)
    elif cmd == "eval-at-synth":
        eval_at_synth(sys.argv[2])
    elif cmd == "eval-at-synth-sparse":
        eval_at_synth_sparse(sys.argv[2])
    elif cmd == "eval-at":
        # ref_equiv.py eval-at <gp|fitc|vfe> <hyp_json> [n [m]]
        eval_at(sys.argv[2], sys.argv[3],
                int(sys.argv[4]) if len(sys.argv) > 4 else 8000,
                int(sys.argv[5]) if len(sys.argv) > 5 else 512)
    else:
        raise SystemExit(f"unknown command {cmd}")
