"""Fused Pallas TPU kernels for the SE covariance matrix.

Replaces the reference's two-pass sdist_mm + CovSE evaluation
(util.cpp:63-80 feeding CovSEard.cpp:7-11) with ONE kernel per K tile:
the (TM, d) x (d, TN) cross-product runs on the MXU, the rank-1 norm
corrections, exp and sigma_f^2 scale fuse in VMEM, and each K tile is
written to HBM exactly once.  This is the memory-bound piece of the NLL hot
loop (SURVEY.md section 3.1); the Cholesky itself is compute-bound and
stays on XLA's tuned blocked factorization.

The public covariance functions (`seard_k_pallas`, `seiso_k_pallas`) are
jax.custom_vjp: the forward pass is the Pallas kernel, the backward pass is
closed-form XLA matmuls (cotangents of K contract against K itself), so the
fused kernel is a drop-in for every differentiated path in the models —
hyperparameter gradients AND test-input gradients.

Inputs are pre-scaled by 1/lengthscale (O(Nd), negligible), which makes ARD
and iso the same kernel.  The feature dimension is zero-padded to the
128-lane boundary (zeros do not change squared distances); row counts are
padded to the tile size and sliced off after the call.  Small shapes (and
non-TPU backends) fall back to the plain XLA formula — also what makes the
functions vmap-safe for the per-point gradient APIs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sdist import sqdist

# use the fused kernel only where it pays off
_MIN_ROWS = 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


# covariance forms the fused tile kernels can evaluate from the scaled
# squared distance (inputs pre-divided by lengthscale).  "se" is the
# reference family; "m52"/"m32" are the Matern extras (kernels_extra.py)
# — same MXU cross-product, different VMEM elementwise map.
_M52_A = float(np.sqrt(5.0))
_M32_A = float(np.sqrt(3.0))
_R_FLOOR = 1e-32         # matches kernels_extra._R_FLOOR (safe-sqrt at r=0)


def _cov_from_sq(form: str, sq, sf2, p1=None):
    """p1: the form's extra scalar (RQ's alpha); unused by se/matern."""
    if form == "se":
        return sf2 * jnp.exp(-0.5 * sq)
    if form == "rq":
        # (1 + d2/(2 alpha))^{-alpha} via exp(-alpha log1p(.)): stable
        # for all alpha in the search box [1e-3, 1e3]
        return sf2 * jnp.exp(-p1 * jnp.log1p(sq / (2.0 * p1)))
    ar = (_M52_A if form == "m52" else _M32_A) * jnp.sqrt(sq + _R_FLOOR)
    poly = 1.0 + ar + (ar * ar / 3.0 if form == "m52" else 0.0)
    return sf2 * poly * jnp.exp(-ar)


def _se_tile_kernel(x1_ref, x2_ref, sf2_ref, p1_ref, out_ref, *,
                    form: str = "se"):
    """One (tm, tn) tile of K(form) from pre-scaled inputs."""
    a = x1_ref[:]                                   # (tm, dp)
    b = x2_ref[:]                                   # (tn, dp)
    cross = jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        # explicit: Mosaic rejects the library-wide "high" (3-pass bf16)
        # default; full-f32 products are wanted here anyway
        precision=jax.lax.Precision.HIGHEST)        # (tm, tn) on the MXU
    n1 = jnp.sum(a * a, axis=1, keepdims=True)      # (tm, 1)
    n2 = jnp.sum(b * b, axis=1, keepdims=True).T    # (1, tn)
    sq = jnp.maximum(n1 + n2 - 2.0 * cross, 0.0)
    out_ref[:] = _cov_from_sq(form, sq, sf2_ref[0, 0],
                              p1_ref[0, 0]).astype(out_ref.dtype)


def _se_tile_kernel_diag(x1_ref, x2_ref, sf2_ref, p1_ref, dvals_ref,
                         out_ref, *, form: str = "se"):
    """Symmetric-build tile with the diagonal OVERWRITTEN in-VMEM.

    Any post-hoc diagonal fix on the assembled K costs a full N^2
    read+write pass: the Pallas custom-call is opaque to XLA fusion, so
    even an O(N) `.at[i, i]` scatter materializes as a whole-buffer
    kCustom op plus layout repairs (measured 2.3 ms at N=8192 f32 — ~9%
    of the entire NLL+gradient objective).  Writing dvals on the i == j
    tiles here makes the diagonal exact (sf2 [+ sn2]) at zero extra HBM
    traffic, and also removes the quadratic-expansion rounding the plain
    kernel leaves on the diagonal.
    """
    a = x1_ref[:]
    b = x2_ref[:]
    cross = jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    n1 = jnp.sum(a * a, axis=1, keepdims=True)
    n2 = jnp.sum(b * b, axis=1, keepdims=True).T
    sq = jnp.maximum(n1 + n2 - 2.0 * cross, 0.0)
    tile = _cov_from_sq(form, sq, sf2_ref[0, 0], p1_ref[0, 0])
    tm, tn = tile.shape
    i = pl.program_id(0)
    j = pl.program_id(1)
    row = jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 1)
    on_diag = jnp.logical_and(row == col, i == j)
    tile = jnp.where(on_diag, dvals_ref[0, :][None, :], tile)
    out_ref[:] = tile.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tm", "tn", "interpret",
                                             "form"))
def _se_matrix_padded(x1s, x2s, sf2, p1, tm: int, tn: int, interpret: bool,
                      form: str = "se"):
    m, dp = x1s.shape
    n = x2s.shape[0]
    # enable_x64(False): the library enables global x64 (CPU parity), which
    # promotes index-map constants to i64 — Mosaic cannot legalize i64
    # scalars ("failed to legalize func.return (i32, i64)").  All kernel
    # index arithmetic is well within i32.  The interpreter path (CPU
    # tests, possibly float64 data) must keep x64 semantics.
    import contextlib
    ctx = (contextlib.nullcontext() if interpret
           else jax.enable_x64(False))
    with ctx:
        return pl.pallas_call(
            functools.partial(_se_tile_kernel, form=form),
            out_shape=jax.ShapeDtypeStruct((m, n), x1s.dtype),
            grid=(m // tm, n // tn),
            in_specs=[
                pl.BlockSpec((tm, dp), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tn, dp), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(x1s, x2s, sf2, p1)


@functools.partial(jax.jit, static_argnames=("t", "interpret", "form"))
def _se_matrix_diag_padded(xs, sf2, p1, dvals, t: int, interpret: bool,
                           form: str = "se"):
    m, dp = xs.shape
    import contextlib
    ctx = (contextlib.nullcontext() if interpret
           else jax.enable_x64(False))
    with ctx:
        return pl.pallas_call(
            functools.partial(_se_tile_kernel_diag, form=form),
            out_shape=jax.ShapeDtypeStruct((m, m), xs.dtype),
            grid=(m // t, m // t),
            in_specs=[
                pl.BlockSpec((t, dp), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t, dp), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, t), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((t, t), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(xs, xs, sf2, p1, dvals)


def se_matrix_diag(inv_l, sf2, x, dvals, tile: int = 512, interpret=None,
                   form: str = "se", p1=1.0):
    """Symmetric K(X, X) with diag OVERWRITTEN by dvals, fused single-pass.

    Rows are padded to the tile size (padded dvals = 1, harmless: the pad
    block is sliced off).  See _se_tile_kernel_diag for why this exists.
    `form` selects the covariance map from the scaled squared distance
    ("se" | "m52" | "m32" — see _cov_from_sq).
    """
    x = jnp.asarray(x)
    n, d = x.shape
    dtype = x.dtype
    t = min(tile, _round_up(n, 128))
    np_, dp = _round_up(n, t), _round_up(d, 128)
    inv_l = jnp.asarray(inv_l, dtype)
    xs = jnp.zeros((np_, dp), dtype).at[:n, :d].set(x * inv_l)
    dv = jnp.ones((1, np_), dtype).at[0, :n].set(jnp.asarray(dvals, dtype))
    if interpret is None:
        interpret = not _on_tpu()
    K = _se_matrix_diag_padded(xs, jnp.asarray(sf2, dtype).reshape(1, 1),
                               jnp.asarray(p1, dtype).reshape(1, 1),
                               dv, t, interpret, form)
    return K[:n, :n]


def se_matrix(inv_l, sf2, x1, x2, tile: int = 512, interpret=None,
              form: str = "se", p1=1.0):
    """K(form) from pre-scaled distances, fused single-pass build
    (default form "se": sf2 * exp(-0.5 |x1/l - x2/l|^2)).

    inv_l: per-dim inverse lengthscales (d,) [ARD] or scalar [iso].
    """
    x1 = jnp.asarray(x1)
    x2 = jnp.asarray(x2)
    m, d = x1.shape
    n = x2.shape[0]
    dtype = x1.dtype

    tm = min(tile, _round_up(m, 8))
    tn = min(tile, _round_up(n, 128))
    mp, np_, dp = _round_up(m, tm), _round_up(n, tn), _round_up(d, 128)

    inv_l = jnp.asarray(inv_l, dtype)
    x1s = jnp.zeros((mp, dp), dtype).at[:m, :d].set(x1 * inv_l)
    x2s = jnp.zeros((np_, dp), dtype).at[:n, :d].set(x2 * inv_l)
    if interpret is None:
        interpret = not _on_tpu()
    K = _se_matrix_padded(x1s, x2s, jnp.asarray(sf2, dtype).reshape(1, 1),
                          jnp.asarray(p1, dtype).reshape(1, 1),
                          tm, tn, interpret, form)
    return K[:m, :n]


# --------------------------------------------------------------------------
# Differentiable covariance functions (KernelSpec `k` contract)
# --------------------------------------------------------------------------

def _se_forward(inv_l, sf2, x1, x2):
    if (x1.shape[0] < _MIN_ROWS or x2.shape[0] < _MIN_ROWS
            or not _on_tpu()
            or jnp.dtype(x1.dtype) == jnp.float64):
        # f64 must take the jnp path: the Mosaic kernel traces under
        # enable_x64(False), where .astype(float64) silently degrades to
        # f32 and the VMEM store dtype-mismatches (hit by the sparse
        # models, which compute f64 on TPU, once M >= _MIN_ROWS)
        return sf2 * jnp.exp(-0.5 * sqdist(x1 * inv_l, x2 * inv_l))
    return se_matrix(inv_l, sf2, x1, x2)


def _se_bwd_terms(K, G, inv_l, x1, x2):
    """Shared cotangent algebra.  E = G o K; returns
    (per-dim sum E (a_i-b_i)^2,  sum 2E,  dx1, dx2)."""
    E = G * K
    a = x1 * inv_l
    b = x2 * inv_l
    rs = jnp.sum(E, axis=1)                     # (m,)
    cs = jnp.sum(E, axis=0)                     # (n,)
    Eb = E @ b                                  # (m, d) — MXU
    # sum_rc E (a_ri - b_ci)^2, per dim
    per_dim = (jnp.einsum("ri,r->i", a * a, rs)
               + jnp.einsum("ci,c->i", b * b, cs)
               - 2.0 * jnp.sum(a * Eb, axis=0))
    g_logsf = 2.0 * jnp.sum(E)
    inv_l2 = inv_l * inv_l
    dx1 = (E @ x2 - rs[:, None] * x1) * inv_l2
    dx2 = (E.T @ x1 - cs[:, None] * x2) * inv_l2
    return per_dim, g_logsf, dx1, dx2


@jax.custom_vjp
def seard_k_pallas(chyp, x1, x2):
    """SE-ARD covariance (CovSEard.cpp:7-11 semantics), fused on TPU."""
    d = x1.shape[-1]
    return _se_forward(jnp.exp(-chyp[:d]), jnp.exp(2.0 * chyp[d]), x1, x2)


def _seard_fwd(chyp, x1, x2):
    K = seard_k_pallas(chyp, x1, x2)
    return K, (K, chyp, x1, x2)


def _seard_bwd(res, G):
    K, chyp, x1, x2 = res
    d = x1.shape[-1]
    inv_l = jnp.exp(-chyp[:d])
    per_dim, g_logsf, dx1, dx2 = _se_bwd_terms(K, G, inv_l, x1, x2)
    g_chyp = jnp.concatenate([per_dim, g_logsf[None]]).astype(chyp.dtype)
    return g_chyp, dx1.astype(x1.dtype), dx2.astype(x2.dtype)


seard_k_pallas.defvjp(_seard_fwd, _seard_bwd)


@jax.custom_vjp
def seiso_k_pallas(chyp, x1, x2):
    """SE-iso covariance (CovSEiso.cpp:6-11 semantics), fused on TPU."""
    return _se_forward(jnp.exp(-chyp[0]), jnp.exp(2.0 * chyp[1]), x1, x2)


def _seiso_fwd(chyp, x1, x2):
    K = seiso_k_pallas(chyp, x1, x2)
    return K, (K, chyp, x1, x2)


def _seiso_bwd(res, G):
    K, chyp, x1, x2 = res
    inv_l = jnp.exp(-chyp[0])
    per_dim, g_logsf, dx1, dx2 = _se_bwd_terms(K, G, inv_l, x1, x2)
    g_chyp = jnp.stack([jnp.sum(per_dim), g_logsf]).astype(chyp.dtype)
    return g_chyp, dx1.astype(x1.dtype), dx2.astype(x2.dtype)


seiso_k_pallas.defvjp(_seiso_fwd, _seiso_bwd)


# --------------------------------------------------------------------------
# Fused symmetric noise builds: K(X, X) with diag = sf2 + sn2 (real rows)
# or sf2 (decoy rows >= n_real), one kernel pass (KernelSpec `k_noise`)
# --------------------------------------------------------------------------
#
# COTANGENT CONTRACT: when n_real < n (far-pad decoys), the cotangent G
# passed to the backward MUST be zero on the decoy diagonal — the callers
# (models/exact._nll_vg_far_padded) already build Q that way, which also
# keeps the backward's quadratic-expansion terms exactly zero at decoy
# magnitudes (rs rows vanish).  The only correction the noise diagonal
# needs is on g_logsf: E = G o K picks up sn2 G_ii on the real diagonal
# where the pure-kernel E would have sf2 G_ii — the (a-b)^2 and dx terms
# are self-cancelling on the diagonal (a == b).


def _se_noise_forward(inv_l, sf2, sn2, x, n_real: int):
    n = x.shape[0]
    dvals = jnp.where(jnp.arange(n) < n_real, sf2 + sn2, sf2)
    if (n < _MIN_ROWS or not _on_tpu()
            or jnp.dtype(x.dtype) == jnp.float64):  # see _se_forward
        K0 = sf2 * jnp.exp(-0.5 * sqdist(x * inv_l, x * inv_l))
        ids = jnp.arange(n)
        return K0.at[ids, ids].set(dvals.astype(K0.dtype))
    return se_matrix_diag(inv_l, sf2, x, dvals)


def _se_noise_bwd_terms(K, G, inv_l, sn2, x, n_real: int):
    per_dim, g_logsf, dx1, dx2 = _se_bwd_terms(K, G, inv_l, x, x)
    tr_r = jnp.sum(jnp.diagonal(G)[:n_real])
    g_logsf = g_logsf - 2.0 * sn2 * tr_r
    return per_dim, g_logsf, tr_r, dx1 + dx2


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def seard_k_noise_pallas(chyp, sn2, x, n_real: int):
    """K(X,X) + sn2 I (real rows; decoy diag = sf2), SE-ARD, fused."""
    d = x.shape[-1]
    return _se_noise_forward(jnp.exp(-chyp[:d]), jnp.exp(2.0 * chyp[d]),
                             sn2, x, n_real)


def _seard_noise_fwd(chyp, sn2, x, n_real):
    K = seard_k_noise_pallas(chyp, sn2, x, n_real)
    return K, (K, chyp, sn2, x)


def _seard_noise_bwd(n_real, res, G):
    K, chyp, sn2, x = res
    d = x.shape[-1]
    inv_l = jnp.exp(-chyp[:d])
    per_dim, g_logsf, tr_r, dx = _se_noise_bwd_terms(K, G, inv_l, sn2, x,
                                                     n_real)
    g_chyp = jnp.concatenate([per_dim, g_logsf[None]]).astype(chyp.dtype)
    return g_chyp, tr_r.astype(chyp.dtype), dx.astype(x.dtype)


seard_k_noise_pallas.defvjp(_seard_noise_fwd, _seard_noise_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def seiso_k_noise_pallas(chyp, sn2, x, n_real: int):
    """K(X,X) + sn2 I (real rows; decoy diag = sf2), SE-iso, fused."""
    return _se_noise_forward(jnp.exp(-chyp[0]), jnp.exp(2.0 * chyp[1]),
                             sn2, x, n_real)


def _seiso_noise_fwd(chyp, sn2, x, n_real):
    K = seiso_k_noise_pallas(chyp, sn2, x, n_real)
    return K, (K, chyp, sn2, x)


def _seiso_noise_bwd(n_real, res, G):
    K, chyp, sn2, x = res
    inv_l = jnp.exp(-chyp[0])
    per_dim, g_logsf, tr_r, dx = _se_noise_bwd_terms(K, G, inv_l, sn2, x,
                                                     n_real)
    g_chyp = jnp.stack([jnp.sum(per_dim), g_logsf]).astype(chyp.dtype)
    return g_chyp, tr_r.astype(chyp.dtype), dx.astype(x.dtype)


seiso_k_noise_pallas.defvjp(_seiso_noise_fwd, _seiso_noise_bwd)


# --------------------------------------------------------------------------
# Matern-5/2 / -3/2 fused builds + closed-form backward (round 5)
#
# Same MXU cross-product tile as the SE kernels, different VMEM
# elementwise map (form "m52"/"m32" in _cov_from_sq).  The backward rides
# _se_bwd_terms's quadratic expansion unchanged: for any stationary
# k(d2), g_log_l_i = sum E2 (a_i-b_i)^2 and the input gradients take the
# identical E2-matvec shape with E2 = -2 G dk/d(d2) — the SE case is just
# E2 = G o K (dk/dd2 = -k/2).  For Matern:
#
#   m52:  dk/dd2 = -sf2 (a^2/6)(1 + a r) e^{-a r},   a = sqrt(5)
#   m32:  dk/dd2 = -sf2 (a^2/2) e^{-a r},            a = sqrt(3)
#
# d2 is recomputed in the backward via one sqdist (O(N^2 d) MXU — same
# cost class as the SE backward's E@b matvecs).  g_log_sf = 2 sum(G o K)
# uses the forward-saved K (the _se_bwd_terms g_logsf slot is E2-based
# and wrong for Matern — overridden below).
# --------------------------------------------------------------------------


def _matern_e2(G, inv_l, sf2, x1, x2, form: str):
    """E2 = -2 G dk/d(d2) for the Matern forms (exact zeros wherever
    exp(-ar) underflows — the far-pad decoy contract)."""
    sq = sqdist(x1 * inv_l, x2 * inv_l)
    ar = (_M52_A if form == "m52" else _M32_A) * jnp.sqrt(sq + _R_FLOOR)
    if form == "m52":
        c = (5.0 / 3.0) * (1.0 + ar)
    else:
        c = 3.0
    return G * (sf2 * c * jnp.exp(-ar))


def _matern_forward(inv_l, sf2, x1, x2, form: str):
    if (x1.shape[0] < _MIN_ROWS or x2.shape[0] < _MIN_ROWS
            or not _on_tpu()
            or jnp.dtype(x1.dtype) == jnp.float64):  # see _se_forward
        sq = sqdist(x1 * inv_l, x2 * inv_l)
        return _cov_from_sq(form, sq, sf2)
    return se_matrix(inv_l, sf2, x1, x2, form=form)


def _matern_bwd_terms(K, G, inv_l, sf2, x1, x2, form: str):
    E2 = _matern_e2(G, inv_l, sf2, x1, x2, form)
    per_dim, _, dx1, dx2 = _se_bwd_terms(E2, jnp.ones_like(G), inv_l,
                                         x1, x2)
    # _se_bwd_terms forms E = G_arg o K_arg; passing (K_arg=E2, G_arg=1)
    # reuses its reductions with E = E2.  g_logsf needs K, not E2:
    g_logsf = 2.0 * jnp.sum(G * K)
    return per_dim, g_logsf, dx1, dx2


def matern_k_pallas(form: str, ard: bool):
    """Factory: differentiable Matern covariance (KernelSpec `k`) with a
    fused Pallas forward on TPU f32 and a closed-form XLA backward."""

    @jax.custom_vjp
    def k(chyp, x1, x2):
        d = x1.shape[-1]
        if ard:
            return _matern_forward(jnp.exp(-chyp[:d]),
                                   jnp.exp(2.0 * chyp[d]), x1, x2, form)
        return _matern_forward(jnp.exp(-chyp[0]), jnp.exp(2.0 * chyp[1]),
                               x1, x2, form)

    def fwd(chyp, x1, x2):
        K = k(chyp, x1, x2)
        return K, (K, chyp, x1, x2)

    def bwd(res, G):
        K, chyp, x1, x2 = res
        d = x1.shape[-1]
        inv_l = jnp.exp(-chyp[:d]) if ard else jnp.exp(-chyp[0])
        sf2 = jnp.exp(2.0 * chyp[d if ard else 1])
        per_dim, g_logsf, dx1, dx2 = _matern_bwd_terms(K, G, inv_l, sf2,
                                                       x1, x2, form)
        if ard:
            g_chyp = jnp.concatenate([per_dim, g_logsf[None]])
        else:
            g_chyp = jnp.stack([jnp.sum(per_dim), g_logsf])
        return (g_chyp.astype(chyp.dtype), dx1.astype(x1.dtype),
                dx2.astype(x2.dtype))

    k.defvjp(fwd, bwd)
    return k


def matern_k_noise_pallas(form: str, ard: bool):
    """Factory: fused Matern K + noise-diag build (KernelSpec `k_noise`).
    Same cotangent contract as the SE noise builds (decoy diagonal of G
    zero; E2 rows vanish at decoy distances because exp(-ar) is exact
    zero there)."""

    @functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
    def k_noise(chyp, sn2, x, n_real: int):
        d = x.shape[-1]
        inv_l = jnp.exp(-chyp[:d]) if ard else jnp.exp(-chyp[0])
        sf2 = jnp.exp(2.0 * chyp[d if ard else 1])
        n = x.shape[0]
        dvals = jnp.where(jnp.arange(n) < n_real, sf2 + sn2, sf2)
        if (n < _MIN_ROWS or not _on_tpu()
                or jnp.dtype(x.dtype) == jnp.float64):
            K0 = _cov_from_sq(form, sqdist(x * inv_l, x * inv_l), sf2)
            ids = jnp.arange(n)
            return K0.at[ids, ids].set(dvals.astype(K0.dtype))
        return se_matrix_diag(inv_l, sf2, x, dvals, form=form)

    def fwd(chyp, sn2, x, n_real):
        K = k_noise(chyp, sn2, x, n_real)
        return K, (K, chyp, sn2, x)

    def bwd(n_real, res, G):
        K, chyp, sn2, x = res
        d = x.shape[-1]
        inv_l = jnp.exp(-chyp[:d]) if ard else jnp.exp(-chyp[0])
        sf2 = jnp.exp(2.0 * chyp[d if ard else 1])
        per_dim, g_logsf, dx1, dx2 = _matern_bwd_terms(K, G, inv_l, sf2,
                                                       x, x, form)
        # noise diagonal: E = G o K picks up sn2 G_ii on the real
        # diagonal where the pure-kernel term would be sf2 G_ii (the
        # (a-b)^2 and dx terms self-cancel on the diagonal, a == b)
        tr_r = jnp.sum(jnp.diagonal(G)[:n_real])
        g_logsf = g_logsf - 2.0 * sn2 * tr_r
        if ard:
            g_chyp = jnp.concatenate([per_dim, g_logsf[None]])
        else:
            g_chyp = jnp.stack([jnp.sum(per_dim), g_logsf])
        return (g_chyp.astype(chyp.dtype), tr_r.astype(chyp.dtype),
                (dx1 + dx2).astype(x.dtype))

    k_noise.defvjp(fwd, bwd)
    return k_noise


# --------------------------------------------------------------------------
# Rational Quadratic fused builds + closed-form backward (round 5)
#
#   k = sf2 (1 + u)^{-alpha},  u = d2 / (2 alpha)
#   dk/dd2      = -(sf2/2) (1+u)^{-alpha-1}         -> E2 = G sf2 (1+u)^{-a-1}
#   dk/dlog sf  = 2 k
#   dk/dlog a   = k * alpha * (u/(1+u) - log1p(u))
#
# Same E2 quadratic expansion as SE/Matern for the lengthscale and input
# cotangents; the extra log-alpha reduction is one fused elementwise
# sum (u recomputed from sqdist in the backward).  Alpha rides into the
# Pallas tile as the p1 SMEM scalar.  NOT far-pad eligible (polynomial
# decay never underflows) — the RQ objective keeps the pad-once path.
# --------------------------------------------------------------------------


def _rq_forward(inv_l, sf2, alpha, x1, x2):
    if (x1.shape[0] < _MIN_ROWS or x2.shape[0] < _MIN_ROWS
            or not _on_tpu()
            or jnp.dtype(x1.dtype) == jnp.float64):  # see _se_forward
        sq = sqdist(x1 * inv_l, x2 * inv_l)
        return _cov_from_sq("rq", sq, sf2, alpha)
    return se_matrix(inv_l, sf2, x1, x2, form="rq", p1=alpha)


def _rq_bwd_terms(K, G, inv_l, sf2, alpha, x1, x2):
    sq = sqdist(x1 * inv_l, x2 * inv_l)
    u = sq / (2.0 * alpha)
    E2 = G * (sf2 * jnp.exp(-(alpha + 1.0) * jnp.log1p(u)))
    per_dim, _, dx1, dx2 = _se_bwd_terms(E2, jnp.ones_like(G), inv_l,
                                         x1, x2)
    GK = G * K
    g_logsf = 2.0 * jnp.sum(GK)
    g_loga = jnp.sum(GK * (alpha * (u / (1.0 + u) - jnp.log1p(u))))
    return per_dim, g_logsf, g_loga, dx1, dx2


def rq_k_pallas(ard: bool):
    """Factory: differentiable RQ covariance (KernelSpec `k`), fused
    Pallas forward on TPU f32, closed-form XLA backward."""

    @jax.custom_vjp
    def k(chyp, x1, x2):
        d = x1.shape[-1]
        nl = d if ard else 1
        return _rq_forward(jnp.exp(-chyp[:nl]) if ard
                           else jnp.exp(-chyp[0]),
                           jnp.exp(2.0 * chyp[nl]),
                           jnp.exp(chyp[nl + 1]), x1, x2)

    def fwd(chyp, x1, x2):
        K = k(chyp, x1, x2)
        return K, (K, chyp, x1, x2)

    def bwd(res, G):
        K, chyp, x1, x2 = res
        d = x1.shape[-1]
        nl = d if ard else 1
        inv_l = jnp.exp(-chyp[:nl]) if ard else jnp.exp(-chyp[0])
        sf2 = jnp.exp(2.0 * chyp[nl])
        alpha = jnp.exp(chyp[nl + 1])
        per_dim, g_logsf, g_loga, dx1, dx2 = _rq_bwd_terms(
            K, G, inv_l, sf2, alpha, x1, x2)
        if ard:
            g_chyp = jnp.concatenate([per_dim, g_logsf[None],
                                      g_loga[None]])
        else:
            g_chyp = jnp.stack([jnp.sum(per_dim), g_logsf, g_loga])
        return (g_chyp.astype(chyp.dtype), dx1.astype(x1.dtype),
                dx2.astype(x2.dtype))

    k.defvjp(fwd, bwd)
    return k


def rq_k_noise_pallas(ard: bool):
    """Factory: fused RQ K + noise-diag build (KernelSpec `k_noise`)."""

    @functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
    def k_noise(chyp, sn2, x, n_real: int):
        d = x.shape[-1]
        nl = d if ard else 1
        inv_l = jnp.exp(-chyp[:nl]) if ard else jnp.exp(-chyp[0])
        sf2 = jnp.exp(2.0 * chyp[nl])
        alpha = jnp.exp(chyp[nl + 1])
        n = x.shape[0]
        dvals = jnp.where(jnp.arange(n) < n_real, sf2 + sn2, sf2)
        if (n < _MIN_ROWS or not _on_tpu()
                or jnp.dtype(x.dtype) == jnp.float64):
            K0 = _cov_from_sq("rq", sqdist(x * inv_l, x * inv_l), sf2,
                              alpha)
            ids = jnp.arange(n)
            return K0.at[ids, ids].set(dvals.astype(K0.dtype))
        return se_matrix_diag(inv_l, sf2, x, dvals, form="rq", p1=alpha)

    def fwd(chyp, sn2, x, n_real):
        K = k_noise(chyp, sn2, x, n_real)
        return K, (K, chyp, sn2, x)

    def bwd(n_real, res, G):
        K, chyp, sn2, x = res
        d = x.shape[-1]
        nl = d if ard else 1
        inv_l = jnp.exp(-chyp[:nl]) if ard else jnp.exp(-chyp[0])
        sf2 = jnp.exp(2.0 * chyp[nl])
        alpha = jnp.exp(chyp[nl + 1])
        per_dim, g_logsf, g_loga, dx1, dx2 = _rq_bwd_terms(
            K, G, inv_l, sf2, alpha, x, x)
        # noise diagonal: sn2 G_ii rides into g_logsf's G o K term (same
        # correction as SE/Matern); the g_log_alpha factor is exactly
        # zero on the diagonal (u = 0), so no correction there
        tr_r = jnp.sum(jnp.diagonal(G)[:n_real])
        g_logsf = g_logsf - 2.0 * sn2 * tr_r
        if ard:
            g_chyp = jnp.concatenate([per_dim, g_logsf[None],
                                      g_loga[None]])
        else:
            g_chyp = jnp.stack([jnp.sum(per_dim), g_logsf, g_loga])
        return (g_chyp.astype(chyp.dtype), tr_r.astype(chyp.dtype),
                (dx1 + dx2).astype(x.dtype))

    k_noise.defvjp(fwd, bwd)
    return k_noise
