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


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "time-eval"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8000
    if cmd == "time-eval":
        time_eval(n)
    elif cmd == "train":
        train(n)
    else:
        raise SystemExit(f"unknown command {cmd}")
