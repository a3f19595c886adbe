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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sdist import sqdist

# use the fused kernel only where it pays off
_MIN_ROWS = 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _se_tile_kernel(x1_ref, x2_ref, sf2_ref, out_ref):
    """One (tm, tn) tile of K = sf2 exp(-0.5 |a-b|^2)."""
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
    out_ref[:] = (sf2_ref[0, 0] * jnp.exp(-0.5 * sq)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tm", "tn", "interpret"))
def _se_matrix_padded(x1s, x2s, sf2, tm: int, tn: int, interpret: bool):
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
            _se_tile_kernel,
            out_shape=jax.ShapeDtypeStruct((m, n), x1s.dtype),
            grid=(m // tm, n // tn),
            in_specs=[
                pl.BlockSpec((tm, dp), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tn, dp), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(x1s, x2s, sf2)


def se_matrix(inv_l, sf2, x1, x2, tile: int = 512, interpret=None):
    """K = sf2 * exp(-0.5 |x1/l - x2/l|^2), fused single-pass build.

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
                          tm, tn, interpret)
    return K[:m, :n]


# --------------------------------------------------------------------------
# Differentiable covariance functions (KernelSpec `k` contract)
# --------------------------------------------------------------------------

def _se_forward(inv_l, sf2, x1, x2):
    if (x1.shape[0] < _MIN_ROWS or x2.shape[0] < _MIN_ROWS
            or not _on_tpu()):
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
