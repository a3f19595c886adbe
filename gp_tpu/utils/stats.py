"""Statistical helpers mirroring the reference's util layer.

Covers: stdvar/stddev (util.h:32-41), normpdf/normcdf (util.cpp:110-119),
logphi — the GPML-derived log-normal-CDF approximation with gradient
(util.cpp:121-180) — and the Bayesian-optimization comparison helpers
violation / is_feas / better / find_best (util.cpp:181-228) plus
rand_matrix (util.cpp:230-245).

All functions are pure JAX (vectorized; the reference's scalar loops become
lax.select branches) so they can sit inside jit/vmap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def stdvar(v):
    """Unbiased sample variance (N-1 denominator), util.h:32-37."""
    v = jnp.asarray(v)
    n = v.shape[0]
    mean = jnp.sum(v) / n
    return jnp.sum((v - mean) ** 2) / (n - 1)


def stddev(v):
    return jnp.sqrt(stdvar(v))


def normpdf(x):
    x = jnp.asarray(x)
    return jnp.exp(-0.5 * x**2) / jnp.sqrt(2 * jnp.pi)


def normcdf(x):
    x = jnp.asarray(x)
    return 0.5 * jax.scipy.special.erfc(-x / np.sqrt(2.0))


# --- logphi: accurate log(normcdf(x)) and d/dx log(normcdf(x)) -------------
# Three-branch approximation translated from GPML's logphi.m, matching the
# reference's scalar implementation (util.cpp:142-180) but fully vectorized.

_LOGPHI_C = np.array([
    0.00048204, -0.00142906, 0.0013200243174, 0.0009461589032,
    -0.0045563339802, 0.00556964649138, 0.00125993961762116,
    -0.01621575378835404, 0.02629651521057465, -0.001829764677455021,
    2 * (1 - np.pi / 3), (4 - np.pi) / 3, 1.0, 1.0,
])
_LOGPHI_R = np.array([
    1.2753666447299659525, 5.019049726784267463450, 6.1602098531096305441,
    7.409740605964741794425, 2.9788656263939928886,
])
_LOGPHI_Q = np.array([
    2.260528520767326969592, 9.3960340162350541504, 12.048951927855129036034,
    17.081440747466004316, 9.608965327192787870698, 3.3690752069827527677,
])


def logphi(x):
    """Returns (lp, dlp): log Phi(x) and its derivative, elementwise."""
    x = jnp.asarray(x)
    dtype = x.dtype

    # Branch 1: |x| small (x^2 < 0.0492) — 14-term polynomial in lp0.
    lp0 = -x / jnp.sqrt(2 * jnp.pi)
    f = jnp.zeros_like(x)
    for ci in _LOGPHI_C:
        f = lp0 * (jnp.asarray(ci, dtype) + f)
    lp_small = -2.0 * f - jnp.log(jnp.asarray(2.0, dtype))

    # Branch 2: x very negative (x < -11.3137) — rational asymptotic.
    num = jnp.full_like(x, 0.5641895835477550741)
    for ri in _LOGPHI_R:
        num = -x * num / np.sqrt(2.0) + jnp.asarray(ri, dtype)
    den = jnp.ones_like(x)
    for qi in _LOGPHI_Q:
        den = -x * den / np.sqrt(2.0) + jnp.asarray(qi, dtype)
    lp_neg = jnp.log(0.5 * num / den) - 0.5 * x**2

    # Branch 3: everything else — direct erfc.
    lp_mid = jnp.log(0.5 * jax.scipy.special.erfc(-x / np.sqrt(2.0)))

    lp = jnp.where(x**2 < 0.0492, lp_small,
                   jnp.where(x < -11.3137, lp_neg, lp_mid))
    dlp = jnp.where(
        x < -11.3137,
        jnp.abs(den / num) * jnp.sqrt(jnp.asarray(2.0 / jnp.pi, dtype)),
        jnp.exp(-0.5 * x**2 - lp) / jnp.sqrt(2 * jnp.pi),
    )
    return lp, dlp


# --- BO feasibility-rule comparisons (util.cpp:181-228) ---------------------
# Row format: [objective, constraint_1, ..., constraint_c]; a row is feasible
# when every constraint value is <= 0.

def violation(rec):
    rec = jnp.asarray(rec)
    if rec.shape[-1] == 1:
        return jnp.zeros(rec.shape[:-1], rec.dtype)
    return jnp.sum(jnp.maximum(rec[..., 1:], 0.0), axis=-1)


def is_feas(rec):
    return violation(rec) <= 0


def better(rec1, rec2):
    """Feasibility rule: prefer lower violation, then lower objective."""
    cv1, cv2 = violation(rec1), violation(rec2)
    f1, f2 = jnp.asarray(rec1)[..., 0], jnp.asarray(rec2)[..., 0]
    both_viol = (cv1 > 0) & (cv2 > 0)
    return jnp.where(both_viol, cv1 < cv2,
                     jnp.where(cv1 > 0, False,
                               jnp.where(cv2 > 0, True, f1 < f2)))


def find_best(ys):
    """Index + row of the best record under the feasibility rule.

    Vectorized replacement for the reference's linear scan: ranks rows by
    (violation > 0, violation, objective) lexicographically.
    """
    ys = jnp.asarray(ys)
    cv = violation(ys)
    feas = cv <= 0
    any_feas = jnp.any(feas)
    obj_key = jnp.where(feas, ys[..., 0], jnp.inf)
    idx = jnp.where(any_feas, jnp.argmin(obj_key), jnp.argmin(cv))
    return idx, ys[idx]


def find_best_xy(xs, ys):
    """(best_x, best_y) over columns of xs / rows of ys (util.cpp:214-228).

    xs: (dim, n) points as columns (reference layout); ys: (n, 1+c) records.
    """
    idx, best_y = find_best(ys)
    return jnp.asarray(xs)[:, idx], best_y


def rand_matrix(key, num_col, lb, ub, dtype=None):
    """Uniform random matrix in a box, shape (dim, num_col) — columns are
    points, matching util.cpp:230-245."""
    lb = jnp.asarray(lb, dtype)
    ub = jnp.asarray(ub, dtype)
    dim = lb.shape[0]
    u = jax.random.uniform(key, (dim, num_col), lb.dtype, -1.0, 1.0)
    a = 0.5 * (ub - lb)
    b = 0.5 * (ub + lb)
    return a[:, None] * u + b[:, None]


# --------------------------------------------------------------------------
# Generic helpers mirroring util.h:11-56 (the reference's map-based config
# helpers and top-k selection; vestigial there, provided for API parity)
# --------------------------------------------------------------------------

def top_largest(v, k: int):
    """Indices of the k largest entries (util.h:43-56 `top_largest`)."""
    import numpy as np
    v = np.asarray(v).ravel()
    k = min(int(k), v.size)
    idx = np.argpartition(-v, k - 1)[:k]
    return idx[np.argsort(-v[idx])]


def with_default(mapping, key, default):
    """util.h:11-20: option lookup with fallback."""
    return mapping.get(key, default)


def get_required(mapping, key):
    """util.h:22-30: option lookup that raises when absent."""
    try:
        return mapping[key]
    except KeyError:
        raise KeyError(f"required option {key!r} not set") from None
