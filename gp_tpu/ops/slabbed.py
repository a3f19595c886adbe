"""Column-slab storage for kernel matrices past XLA:TPU's int32 limit.

A single (N, N) buffer stops being safe on TPU once it holds more than
2^31 elements (N > 46340): XLA:TPU emits int32 index arithmetic inside
fused in-place updates, so `L.at[c1:, c1:].add(-(pan @ pan.T))` on such a
buffer SILENTLY corrupts values (measured at N=51200 f32: 0.68 absolute
error in the trailing block and a non-SPD factorization from panel 1 on,
while each individual slice / DUS / GEMM op on the same buffer is still
correct).  The boundary is element count, not bytes — N=32768 f32
(2^30 elements, 4.3 GB) is verified clean.

This module therefore never materializes a big matrix as one buffer:
K (and its Cholesky factor L) live as a tuple of column slabs, each an
(Np, w) array capped at `MAX_SLAB_ELEMS` elements, so every in-place
region XLA fuses stays within proven-safe int32 addressing.  The blocked
right-looking factorization, triangular solves and logdet from
ops/blocked.py are re-expressed over the slab tuple; trailing updates
become one GEMM + in-slab add per (panel, slab) pair — still large MXU
matmuls.

Rows are padded up to a multiple of `block` with an identity tail
(K~ = blockdiag(K, I)), whose factor is blockdiag(L, I): solves pad the
right-hand side with zeros and slice back, logdet picks up +0.  This
keeps every panel full-size for ANY N.

Replaces the reference's single Eigen buffer (MatrixSolver.cpp:6-28) in
the N-beyond-HBM-comfort regime; consumed by models/exact.py's streamed
objective and posterior paths via the tuple dispatch in ops/chol.py.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

# Proven-safe per-buffer element count (see module docstring).
MAX_SLAB_ELEMS = 1 << 30

# Slab width cap: wider slabs mean fewer buffers but a bigger live GEMM
# temp per trailing update ((N, w) before the in-place add) — 8192 keeps
# that temp under ~1.7 GB f32 at N=51200 on the 16 GB v5e.
_WIDTH_CAP = 8192


def use_slabs(n: int) -> bool:
    """True when an (n, n) single buffer would exceed safe addressing."""
    return n * n > MAX_SLAB_ELEMS


def slab_width(n_pad: int, block: int) -> int:
    """Largest multiple of `block` such that (n_pad, w) stays addressable."""
    w = MAX_SLAB_ELEMS // n_pad // block * block
    return max(block, min(_WIDTH_CAP // block * block or block, w))


def _starts(slabs):
    starts, t0 = [], 0
    for s in slabs:
        starts.append(t0)
        t0 += s.shape[1]
    return starts, t0


def _solve_block(slabs) -> int:
    """Panel width for solves: must divide every slab width (so a panel
    never crosses a slab edge).  Factorization widths are multiples of its
    block, so the gcd qualifies; prefer a smaller divisor for the
    triangular-solve latency."""
    g = 0
    for s in slabs:
        g = math.gcd(g, s.shape[1])
    for cap in (2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if cap < g and g % cap == 0:
            return cap
    return g


def build_k_noise_slabs(kernel, chyp, x, sn2, block: int = 2048,
                        width: int | None = None):
    """K + sn2 I as column slabs, rows padded to a block multiple.

    One slab = kernel columns k(X, X_J) plus a fused iota-mask diagonal
    add (sn2 on real columns, 1.0 on identity padding) — peak extra
    memory is a single (N, w) panel, never a second N^2 buffer.
    """
    n = x.shape[0]
    n_pad = -(-n // block) * block
    w = width if width is not None else slab_width(n_pad, block)
    rowi = jnp.arange(n_pad)
    slabs = []
    for t0 in range(0, n_pad, w):
        t1 = min(n_pad, t0 + w)
        rmax = min(t1, n)
        slab = jnp.zeros((n_pad, t1 - t0), x.dtype)
        if rmax > t0:
            cols = kernel.k(chyp, x, x[t0:rmax])          # (n, rmax-t0)
            slab = slab.at[:n, :rmax - t0].set(cols)
        jj = t0 + jnp.arange(t1 - t0)
        dval = jnp.where(jj < n, jnp.asarray(sn2, x.dtype),
                         jnp.ones((), x.dtype))
        slab = slab + dval[None, :] * (
            rowi[:, None] == jj[None, :]).astype(x.dtype)
        slabs.append(slab)
    return tuple(slabs)


def slabbed_cholesky(slabs, block: int | None = None, base_block: int = 256):
    """Right-looking blocked Cholesky over column slabs (in place per slab).

    Identical math to blocked.blocked_cholesky; every DUS / in-place add
    targets one sub-2^30-element slab.  A non-SPD diagonal block yields
    NaNs that propagate into all later panels (chol_ok semantics).
    `block` defaults to a divisor of every slab width (panels never cross
    a slab edge).
    """
    from .blocked import blocked_cholesky, tri_inv

    slabs = list(slabs)
    starts, n_pad = _starts(slabs)
    block = block or _solve_block(slabs)
    base_block = min(base_block, block)
    assert n_pad % block == 0 and slabs[0].shape[0] == n_pad

    def base(Kb):
        return blocked_cholesky(Kb, block=max(base_block, block // 4),
                                base_block=base_block)

    ns = len(slabs)
    for j in range(n_pad // block):
        c0, c1 = j * block, (j + 1) * block
        s = next(t for t in reversed(range(ns)) if starts[t] <= c0)
        l0 = c0 - starts[s]
        Ljj = base(slabs[s][c0:c1, l0:l0 + block])
        slabs[s] = slabs[s].at[c0:c1, l0:l0 + block].set(jnp.tril(Ljj))
        if c0:
            # zero this panel's above-diagonal strip (K upper entries)
            slabs[s] = slabs[s].at[:c0, l0:l0 + block].set(
                jnp.zeros((c0, block), slabs[s].dtype))
        if c1 == n_pad:
            break
        Tjj = tri_inv(Ljj, base=base_block)
        pan = slabs[s][c1:, l0:l0 + block] @ Tjj.T        # (n_pad-c1, B)
        slabs[s] = slabs[s].at[c1:, l0:l0 + block].set(pan)
        for t in range(s, ns):
            g0 = max(starts[t], c1)
            g1 = starts[t] + slabs[t].shape[1]
            if g0 >= g1:
                continue
            u0, u1 = g0 - starts[t], g1 - starts[t]
            slabs[t] = slabs[t].at[c1:, u0:u1].add(
                -(pan @ pan[g0 - c1:g1 - c1].T))
        # Panel barrier: without it the XLA scheduler interleaves GEMM
        # temps from MANY panels (~8 GB of concurrent (n-c1, B) buffers at
        # N=51200 — measured OOM on the 16 GB chip even with the K slabs
        # donated); the barrier bounds live temps to one panel's worth.
        slabs = list(jax.lax.optimization_barrier(tuple(slabs)))
    return tuple(slabs)


def slabbed_tri_inv(slabs, block: int | None = None, base_block: int = 256):
    """T = L^-1 for a slab-stored lower factor, slab-in-place.

    Backward column-panel sweep (last panel first).  When panel j starts,
    every column right of it already holds T, so
    ``T[c1:, c0:c1] = -T[c1:, c1:] @ L[c1:, c0:c1] @ T[c0:c1, c0:c1]``
    is one tall GEMM per (panel, slab) pair — n^3/3 total FLOPs, all MXU
    matmuls (vs n^3 per full triangular-solve sweep).  The identity
    padding tail inverts to itself.  Same per-panel optimization_barrier
    as slabbed_cholesky (bounds concurrent GEMM temps to one panel).

    This is the slab analog of LAPACK dtrtri feeding the reference's
    MatrixSolver::inverse (MatrixSolver.cpp:25-28); consumed by the
    streamed analytic gradient (models/exact.py nll_vg_streamed), where
    K^-1 columns then come from T^T T as plain GEMMs.
    """
    from .blocked import tri_inv

    slabs = list(slabs)
    starts, n_pad = _starts(slabs)
    block = block or _solve_block(slabs)
    assert n_pad % block == 0
    ns = len(slabs)
    for j in range(n_pad // block - 1, -1, -1):
        c0, c1 = j * block, (j + 1) * block
        s = next(t for t in reversed(range(ns)) if starts[t] <= c0)
        l0 = c0 - starts[s]
        Tjj = tri_inv(slabs[s][c0:c1, l0:l0 + block], base=base_block)
        if c1 < n_pad:
            pan = slabs[s][c1:, l0:l0 + block]          # L[c1:, c0:c1]
            G = jnp.zeros((n_pad - c1, block), pan.dtype)
            for t in range(s, ns):
                g0 = max(starts[t], c1)
                g1 = starts[t] + slabs[t].shape[1]
                if g0 >= g1:
                    continue
                u0, u1 = g0 - starts[t], g1 - starts[t]
                G = G + slabs[t][c1:, u0:u1] @ pan[g0 - c1:g1 - c1]
            slabs[s] = slabs[s].at[c1:, l0:l0 + block].set(-(G @ Tjj))
        slabs[s] = slabs[s].at[c0:c1, l0:l0 + block].set(jnp.tril(Tjj))
        slabs = list(jax.lax.optimization_barrier(tuple(slabs)))
    return tuple(slabs)


def slabbed_frobenius_sq(slabs):
    """sum of squares of every stored entry (= tr(K~^-1) when the slabs
    hold T = L~^-1: tr(T^T T) = ||T||_F^2; subtract the identity padding
    tail's (n_pad - n) at the call site)."""
    acc = jnp.zeros((), slabs[0].dtype)
    for s in slabs:
        acc = acc + jnp.sum(s * s)
    return acc


def slabbed_t_matmul(slabs, B):
    """T^T @ B for a slab-stored matrix T: one (w_t, n_pad) x (n_pad, b)
    GEMM per slab, rows emitted in slab (= column) order."""
    return jnp.concatenate([s.T @ B for s in slabs], axis=0)


def slabbed_diagonal(slabs):
    """diag(L~) including the identity padding tail."""
    parts, t0 = [], 0
    for s in slabs:
        w = s.shape[1]
        parts.append(jnp.diagonal(s[t0:t0 + w, :]))
        t0 += w
    return jnp.concatenate(parts)


def slabbed_logdet(slabs):
    """2 sum log diag(L); the identity padding contributes log 1 = 0."""
    return 2.0 * jnp.sum(jnp.log(slabbed_diagonal(slabs)))


def _pad_rhs(slabs, B):
    n_pad = slabs[0].shape[0]
    vec = B.ndim == 1
    W = B[:, None] if vec else B
    n = W.shape[0]
    if n < n_pad:
        W = jnp.zeros((n_pad, W.shape[1]), W.dtype).at[:n].set(W)
    return W, n, vec


def slabbed_solve_lower(slabs, B, block: int | None = None):
    """Solve L W = B, forward blocked over slab-stored panels."""
    block = block or _solve_block(slabs)
    starts, n_pad = _starts(slabs)
    W, n, vec = _pad_rhs(slabs, B)
    for j in range(n_pad // block):
        c0, c1 = j * block, (j + 1) * block
        s = next(t for t in reversed(range(len(slabs))) if starts[t] <= c0)
        l0 = c0 - starts[s]
        wj = solve_triangular(slabs[s][c0:c1, l0:l0 + block], W[c0:c1],
                              lower=True)
        W = W.at[c0:c1].set(wj)
        if c1 < n_pad:
            W = W.at[c1:].add(-(slabs[s][c1:, l0:l0 + block] @ wj))
    out = W[:n]
    return out[:, 0] if vec else out


def slabbed_solve_lower_t(slabs, B, block: int | None = None):
    """Solve L^T X = B, backward blocked over slab-stored panels."""
    block = block or _solve_block(slabs)
    starts, n_pad = _starts(slabs)
    X, n, vec = _pad_rhs(slabs, B)
    for j in range(n_pad // block - 1, -1, -1):
        c0, c1 = j * block, (j + 1) * block
        s = next(t for t in reversed(range(len(slabs))) if starts[t] <= c0)
        l0 = c0 - starts[s]
        xj = solve_triangular(slabs[s][c0:c1, l0:l0 + block], X[c0:c1],
                              lower=True, trans=1)
        X = X.at[c0:c1].set(xj)
        if c0 == 0:
            break
        # X[:c0] -= L[c0:c1, :c0]^T xj, one in-slab GEMM per slab piece
        for t in range(s + 1):
            g0 = starts[t]
            g1 = min(starts[t] + slabs[t].shape[1], c0)
            if g0 >= g1:
                continue
            X = X.at[g0:g1].add(
                -(slabs[t][c0:c1, g0 - starts[t]:g1 - starts[t]].T @ xj))
    out = X[:n]
    return out[:, 0] if vec else out


def slabbed_chol_solve(slabs, B, block: int | None = None):
    """Solve (L L^T) X = B via the two slab-blocked sweeps."""
    block = block or _solve_block(slabs)
    return slabbed_solve_lower_t(
        slabs, slabbed_solve_lower(slabs, B, block), block)
