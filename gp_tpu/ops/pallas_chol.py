"""Pallas base-case Cholesky: one BxB block factored in a single kernel.

The blocked Cholesky (ops/blocked.py) turns the trailing O(N^3) work into
big MXU matmuls; what remains serial is the BxB diagonal-block
factorization.  XLA's stock kernel costs ~0.7 ms per call on v5e at any
B <= 2048 (dispatch/loop-bound, not flops).  This kernel factors the block
in VMEM with a right-looking rank-1 loop (column extraction via masked
reductions, the update an MXU outer product).

Measured on v5e: 0.84 ms at B=256, 2.3 ms at B=512 — the masked column
extraction is O(b^2) VPU work per column, so the kernel does NOT beat the
stock path yet; it is kept as a correct, tested building block (a rank-8
micro-panel variant with pl.ds ref indexing is the known next step).  The
default blocked Cholesky therefore keeps the stock base case.

Backward: custom VJP with the standard Cholesky pullback
(Murray 2016, "Differentiation of the Cholesky decomposition"):

    Kbar = 0.5 * L^{-T} (P + P^T) L^{-1},   P = Phi(L^T Lbar)

with Phi = lower triangle, diagonal halved — built from two small
triangular solves (numerically verified against jax.vjp of the stock
kernel in tests/test_pallas_chol.py).

Non-SPD input: rsqrt of a negative pivot produces NaN which propagates to
every later column — identical failure semantics to the stock kernel
(chol_ok sees a NaN diagonal).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.scipy.linalg import solve_triangular


def _chol_kernel(k_ref, o_ref, *, b: int):
    # Mosaic has no dynamic_slice on values: all row/column extraction is
    # mask + reduction over iota (O(b^2) per column, O(b^3) total — VPU
    # work, microseconds at b <= 1024).
    # Mosaic restrictions shape this kernel: no dynamic_slice on values
    # (mask + reduce over iota instead) and no (1, b) row vectors (the
    # rank-1 update is an MXU outer product of two (b, 1) columns).
    A = k_ref[:]
    rows = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)     # (b, 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)     # (b, b)

    def body(j, carry):
        A, O = carry
        colv = jnp.sum(jnp.where(cols == j, A, 0.0), axis=1,
                       keepdims=True)                          # (b, 1)
        d = jnp.sum(jnp.where(rows == j, colv, 0.0))    # (b,1) -> scalar
        inv = jax.lax.rsqrt(d)
        l = jnp.where(rows > j, colv * inv,
                      jnp.where(rows == j, d * inv, 0.0))      # sqrt(d)=d*inv
        outer = jax.lax.dot_general(
            l, l, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=l.dtype,
            precision=jax.lax.Precision.HIGHEST)               # (b, b)
        A = A - outer            # rank-1 trailing update (cols <= j: dead)
        O = jnp.where(cols == j, l, O)
        return A, O

    _, O = jax.lax.fori_loop(0, b, body, (A, jnp.zeros_like(A)))
    o_ref[:] = O


@functools.partial(jax.jit, static_argnames=("interpret",))
def _chol_call(K, interpret: bool):
    b = K.shape[0]
    import contextlib
    ctx = contextlib.nullcontext() if interpret else jax.enable_x64(False)
    with ctx:
        return pl.pallas_call(
            functools.partial(_chol_kernel, b=b),
            out_shape=jax.ShapeDtypeStruct((b, b), K.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(K)


def _chol_panel_kernel(k_ref, o_ref, *, b: int, w: int):
    """Left-looking rank-w micro-panel factorization, entirely in VMEM.

    Per (statically unrolled) micro-panel p:
      1. one MXU GEMM  C = A[:, pw:pw+w] - L @ L[pw:pw+w, :].T  — L's
         not-yet-factored columns are still zero, so no masking is needed;
      2. a w-step rank-1 loop confined to the (b, w) panel (O(b w^2) VPU
         work instead of the O(b^2) full-block masking of _chol_kernel);
      3. one static column-block write into L.

    Total: b/w GEMMs + b rank-1 steps on (b, w) panels — the O(b^3) is all
    MXU, the VPU work drops from O(b^3) to O(b^2 w).

    Measured on v5e (benchmarks/chol_base_ab.py, scan-batched): parity
    with the stock base case at b=256 (~0.6 ms, fixed-overhead bound) but
    1.8-2.8x slower at b=512/1024 (per-column masked extraction + Mosaic
    per-op overhead at small w), and ~1 ms slower end-to-end inside the
    N=8192 blocked factorization.  The stock base case therefore remains
    the default; this kernel is kept as the correct, tested micro-panel
    building block.
    """
    # the output ref itself accumulates the factor: Mosaic has no
    # dynamic_update_slice on VALUES, but static slice stores to a ref are
    # native, and each panel's GEMM re-reads the ref (RAW within a kernel
    # is sequential)
    o_ref[:] = jnp.zeros((b, b), k_ref.dtype)
    rows = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)      # (b, 1)
    pcols = jax.lax.broadcasted_iota(jnp.int32, (b, w), 1)     # (b, w)

    for p0 in range(0, b, w):
        # 1. panel update: (b, b) @ (b, w) MXU GEMM against factored L
        #    (not-yet-factored columns are still zero — no masking needed)
        L = o_ref[:]
        Lp = jax.lax.dot_general(
            L, L[p0:p0 + w, :], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=L.dtype,
            precision=jax.lax.Precision.HIGHEST)               # (b, w)
        C = k_ref[:, p0:p0 + w] - Lp

        # 2. factor the w columns of the panel (dynamic c, masked on (b, w))
        def body(c, C, p0=p0):
            colv = jnp.sum(jnp.where(pcols == c, C, 0.0), axis=1,
                           keepdims=True)                      # (b, 1)
            d = jnp.sum(jnp.where(rows == p0 + c, colv, 0.0))
            inv = jax.lax.rsqrt(d)
            l = jnp.where(rows > p0 + c, colv * inv,
                          jnp.where(rows == p0 + c, d * inv, 0.0))  # (b, 1)
            # pivot row of C (cols > c), embedded full-shape then reduced
            u = jnp.sum(jnp.where(rows == p0 + c, C, 0.0), axis=0,
                        keepdims=True)                         # (1, w)
            upd = l * inv * u                                  # (b, w) outer
            C = jnp.where(pcols > c, C - upd, C)
            return jnp.where(pcols == c, l, C)

        C = jax.lax.fori_loop(0, w, body, C)
        # 3. one static column-block store
        o_ref[:, p0:p0 + w] = C


@functools.partial(jax.jit, static_argnames=("w", "interpret"))
def _chol_panel_call(K, w: int, interpret: bool):
    b = K.shape[0]
    import contextlib
    ctx = contextlib.nullcontext() if interpret else jax.enable_x64(False)
    with ctx:
        return pl.pallas_call(
            functools.partial(_chol_panel_kernel, b=b, w=w),
            out_shape=jax.ShapeDtypeStruct((b, b), K.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(K)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def pallas_cholesky_panel(K, w: int = 128):
    """Rank-w micro-panel Cholesky of one VMEM-resident block."""
    interpret = jax.default_backend() != "tpu"
    return _chol_panel_call(K, w, interpret)


def _chol_panel_fwd(K, w):
    L = pallas_cholesky_panel(K, w)
    return L, L


def _chol_panel_bwd(w, L, Lbar):
    return _chol_bwd(L, Lbar)


pallas_cholesky_panel.defvjp(_chol_panel_fwd, _chol_panel_bwd)


def _chol_inv_kernel(k_ref, l_ref, t_ref, *, b: int):
    """Fused leaf: (L, T = L^{-1}) of one VMEM-resident block in ONE
    kernel dispatch.

    The blocked factorization's serial leaf chain is chol(base) +
    trsm(base) per leaf — two ~12 us dispatch-bound custom-calls whose
    panel dependencies XLA cannot overlap (BASELINE.md round-4 residue:
    2.1 ms over 128 leaf ops at N=8192).  Here the forward-substitution
    recurrence for T rides the SAME rank-1 loop as the factorization
    (row j of T finalizes exactly when pivot j is available), so one
    dispatch replaces the pair.  O(b^2) masked VPU work per step for
    each of the two updates — at b <= 256 both are far below the
    fixed dispatch overhead that dominates the leaf chain.
    """
    A = k_ref[:]
    rows = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)     # (b, 1)
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)    # (b, b)
    cols2 = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)    # (b, b)

    def body(j, carry):
        A, O, T = carry
        colv = jnp.sum(jnp.where(cols2 == j, A, 0.0), axis=1,
                       keepdims=True)                          # (b, 1)
        d = jnp.sum(jnp.where(rows == j, colv, 0.0))
        inv = jax.lax.rsqrt(d)
        l = jnp.where(rows > j, colv * inv,
                      jnp.where(rows == j, d * inv, 0.0))      # sqrt(d)=d*inv
        outer = jax.lax.dot_general(
            l, l, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=l.dtype,
            precision=jax.lax.Precision.HIGHEST)               # (b, b)
        A = A - outer
        O = jnp.where(cols2 == j, l, O)
        # forward substitution on the identity, interleaved: row j of T
        # is final once pivot j exists — scale it, then push the rank-1
        # update into the rows below (T[i,:] -= L[i,j] * T[j,:]/L[j,j])
        tj = jnp.sum(jnp.where(rows2 == j, T, 0.0), axis=0,
                     keepdims=True) * inv                      # (1, b)
        lbelow = jnp.where(rows > j, colv * inv, 0.0)          # (b, 1)
        T = T - lbelow * tj
        T = jnp.where(rows2 == j, tj, T)
        return A, O, T

    eye = jnp.where(rows2 == cols2, jnp.ones((), k_ref.dtype), 0.0)
    _, O, T = jax.lax.fori_loop(
        0, b, body, (A, jnp.zeros_like(A), eye))
    l_ref[:] = O
    t_ref[:] = T


@functools.partial(jax.jit, static_argnames=("interpret",))
def _chol_inv_call(K, interpret: bool):
    b = K.shape[0]
    import contextlib
    ctx = contextlib.nullcontext() if interpret else jax.enable_x64(False)
    with ctx:
        return pl.pallas_call(
            functools.partial(_chol_inv_kernel, b=b),
            out_shape=(jax.ShapeDtypeStruct((b, b), K.dtype),
                       jax.ShapeDtypeStruct((b, b), K.dtype)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)),
            interpret=interpret,
        )(K)


@jax.custom_vjp
def pallas_chol_inv(K):
    """(L, L^{-1}) of one VMEM-resident block, one fused dispatch."""
    interpret = jax.default_backend() != "tpu"
    return _chol_inv_call(K, interpret)


def _chol_inv_fwd(K):
    L, T = pallas_chol_inv(K)
    return (L, T), (L, T)


def _chol_inv_bwd(res, cts):
    L, T = res
    Lbar, Tbar = cts
    # d(L^{-1}) = -L^{-1} dL L^{-1}  =>  Lbar += -T^T Tbar T^T; the
    # standard Cholesky pullback then maps the combined Lbar to Kbar
    # (its tril projection discards the structurally-zero upper part)
    Lbar_tot = Lbar - T.T @ (Tbar @ T.T)
    return _chol_bwd(L, Lbar_tot)


pallas_chol_inv.defvjp(_chol_inv_fwd, _chol_inv_bwd)


@jax.custom_vjp
def pallas_cholesky(K):
    """Lower Cholesky factor of a single VMEM-resident block (<= ~1024)."""
    interpret = jax.default_backend() != "tpu"
    return _chol_call(K, interpret)


def _chol_fwd(K):
    L = pallas_cholesky(K)
    return L, L


def _chol_bwd(L, Lbar):
    P = jnp.tril(L.T @ Lbar)
    P = P - 0.5 * jnp.diag(jnp.diagonal(P))
    S = P + P.T
    # Kbar = 0.5 L^{-T} S L^{-1}
    T1 = solve_triangular(L, S, lower=True, trans=1)          # L^{-T} S
    Kbar = 0.5 * solve_triangular(L, T1.T, lower=True, trans=1).T
    return (Kbar,)


pallas_cholesky.defvjp(_chol_fwd, _chol_bwd)
