"""2-D block-cyclic distributed Cholesky — the DCN-lean grid layout.

The 1-D row-cyclic factorization (parallel/pchol.py) all-gathers the full
(N, B) panel to every device each step: ~4N^2 bytes/device/evaluation,
ALL of it crossing the host boundary when the "rows" ring spans hosts
(BASELINE.md round-4 comm model — the term that caps 1->2-host scaling
efficiency at ~49% for N=51200 on 25 GB/s DCN).

Here the block grid is 2-D (ScaLAPACK pdpotrf layout): global block
(i, j) lives on device (i mod Pr, j mod Pc) of a ("rowg", "colg") mesh.
Per panel k each device needs only the panel blocks matching its OWN grid
row (left operands) and grid column (right operands):

    row-broadcast  (psum over "colg"):  N*B/Pr per device
    col-broadcast  (psum over "rowg"):  N*B/Pc per device

With the mesh laid out so "colg" is the intra-host (ICI) axis and "rowg"
spans hosts (Pr = number of hosts), ONLY the col-broadcast rides DCN:
8N^2/Pc bytes per factorization (psum = 2x payload) vs the 1-D layout's
4N^2 — a 4x DCN cut at Pc = 8, growing linearly with chips per host.
Full accounting in BASELINE.md round 4.

Like pchol.pchol_local, the trailing update slices to the static
conservative corner [ (k+1)//Pr :, (k+1)//Pc : ] — boundary blocks whose
global index is still <= k carry exact zeros in the broadcast panels, so
they contribute nothing (same FLOP accounting as the 1-D rectangle
update).

Scope (round 4): the FULL training evaluation — factorization, logdet,
solves, W = L^{-1} (pinv2d), K^{-1} tiles (SUMMA pkinv2d), the analytic
NLL+gradient (pnll_vg2d), and a hosted bounded fit (pfit2d_hosted).
FLOP tradeoff vs the 1-D layout: the SUMMA W^T W cannot statically
slice away block-upper tiles (the triangle boundary depends on the
traced grid coordinates), so the gradient costs ~1.33x the 1-D
streamed-SYRK FLOPs — bought: ~6x less DCN per full evaluation
(BASELINE.md round-4 comm model).

Reference semantics match MatrixSolverLLT (MatrixSolver.cpp:6-28) +
GP::_calcNegLogProb (GP.cpp:120-148): NaN from a non-SPD pivot
propagates into every later panel, so chol-ok probes and the rescue
ladders work unchanged.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import solve_triangular
from jax.sharding import Mesh, PartitionSpec as P

from ..models.base import (from_opt_vec, hyp_mean, hyp_sn2,
                           sanitize_value_and_grad)
from ..ops.kernels import KernelSpec
from . import pchol

shard_map = jax.shard_map

AXR, AXC = "rowg", "colg"


# --------------------------------------------------------------------------
# Host-side layout helpers
# --------------------------------------------------------------------------

def blocked_layout_2d(K, pr: int, pc: int, block: int):
    """(N, N) -> (Pr, Pc, nbr, nbc, B, B): [r, c, li, lj] = global block
    (li*Pr + r, lj*Pc + c).  Shard dims 0, 1 over the ("rowg", "colg")
    mesh axes."""
    n = K.shape[0]
    nb = n // block
    assert nb * block == n and nb % pr == 0 and nb % pc == 0, (
        f"N={n} must tile into nb blocks of {block} with Pr={pr} | nb and "
        f"Pc={pc} | nb (nb={nb})")
    K6 = K.reshape(nb // pr, pr, block, nb // pc, pc, block)
    return K6.transpose(1, 4, 0, 3, 2, 5)


def unblocked_layout_2d(Kb):
    """Inverse of blocked_layout_2d."""
    pr, pc, nbr, nbc, B = Kb.shape[:5]
    return np.asarray(Kb).transpose(2, 0, 4, 3, 1, 5).reshape(
        nbr * pr * B, nbc * pc * B)


def pad_amount(n: int, pr: int, pc: int, block: int) -> int:
    """Rows to append so N tiles into block-multiples of lcm(pr, pc)."""
    m = block * pr * pc // np.gcd(pr, pc)
    return (-n) % m


# --------------------------------------------------------------------------
# In-shard_map pieces (per-device code)
# --------------------------------------------------------------------------

def _grid_ids(nbr: int, nbc: int, pr: int, pc: int):
    r = jax.lax.axis_index(AXR)
    c = jax.lax.axis_index(AXC)
    gi = jnp.arange(nbr) * pr + r                       # global row-block ids
    gj = jnp.arange(nbc) * pc + c                       # global col-block ids
    return r, c, gi, gj


def _replicate_from(val, owner_r, owner_c, r, c):
    """Broadcast `val` from the (owner_r, owner_c) device to the grid."""
    v = jnp.where((r == owner_r) & (c == owner_c), val, jnp.zeros_like(val))
    return jax.lax.psum(jax.lax.psum(v, AXR), AXC)


def _pchol2d_panel(K_loc, k: int, pr: int, pc: int, r, c, gi, gj):
    """Steps 1-4 of grid panel k: factor + replicate the diagonal block,
    owner-column TRSM, panel write-back, and the row/col broadcasts.
    Returns (K_loc with the finalized panel column written, prow, pcol).
    """
    nbr, nbc, B = K_loc.shape[0], K_loc.shape[1], K_loc.shape[2]
    orow, oc = k % pr, k % pc
    li, lj = k // pr, k // pc

    # 1. factor + replicate the diagonal block
    Lkk = jnp.linalg.cholesky(K_loc[li, lj])
    Lkk = _replicate_from(Lkk, orow, oc, r, c)

    # 2. owner-column TRSM: X[i] = K[i, k] Lkk^{-T} for i > k
    col = K_loc[:, lj]                               # (nbr, B, B)
    X = solve_triangular(
        Lkk, col.reshape(nbr * B, B).T, lower=True).T.reshape(
        nbr, B, B)
    below = (gi > k)[:, None, None]
    X = jnp.where(below & (c == oc), X, 0.0)

    # write the finalized panel column back (owner column only)
    newcol = jnp.where(below, X, col)
    newcol = newcol.at[li].set(
        jnp.where(r == orow, jnp.tril(Lkk), newcol[li]))
    K_loc = K_loc.at[:, lj].set(
        jnp.where(c == oc, newcol, K_loc[:, lj]))

    # 3. row-broadcast: L[i, k] for MY row-block ids (left operands)
    prow = jax.lax.psum(jnp.where(c == oc, X, 0.0), AXC)  # (nbr, B, B)

    # 4. col-broadcast: L[j, k] for MY col-block ids (right operands).
    #    Block j lives in prow slot (j - r) / pr on grid row j % pr;
    #    exactly one grid row contributes per slot, so the masked
    #    psum over "rowg" is a disjoint scatter, not a reduction.
    src = jnp.clip((gj - r) // pr, 0, nbr - 1)       # (nbc,)
    have = (gj % pr) == r
    cand = jnp.take(prow, src, axis=0)               # (nbc, B, B)
    pcol = jax.lax.psum(
        jnp.where(have[:, None, None], cand, 0.0), AXR)
    pcol = jnp.where((gj > k)[:, None, None], pcol, 0.0)
    return K_loc, prow, pcol


def pchol2d_local(K_loc, pr: int, pc: int, lookahead: bool = True):
    """Right-looking blocked Cholesky on the 2-D block-cyclic layout.

    K_loc: (nbr, nbc, B, B) — this device's blocks.  Returns L in the
    same layout: diagonal blocks tril'd, above-diagonal blocks untouched
    (consumers read the block lower triangle only, mirroring the 1-D
    zero-upper-free contract).

    lookahead=True (default) pipelines panels one step ahead — the 2-D
    analog of pchol.pchol_local's lookahead: the trailing update with
    panel k is split into the NARROW local column slice lj0 = (k+1)//pc
    that finalizes panel k+1's own column (rows with gi > k all live at
    local row >= (k+1)//pr, so the conservative-corner slice covers
    them; boundary blocks with gj <= k carry exact zeros in pcol and
    no-op) and the WIDE remainder [lj0+1:].  Panel k+1 is then factored,
    TRSM'd and its row/col broadcasts ISSUED before the wide einsum, so
    XLA's latency-hiding scheduler overlaps the DCN-crossing
    col-broadcast (the term BASELINE.md's 2-D efficiency table needs
    hidden) with the dominant MXU GEMM instead of serializing nb
    blocking broadcasts on the critical path.  Identical arithmetic per
    output element (the update is the same contraction applied in two
    disjoint column slices): bitwise-equal factors on the virtual grid
    (tests/test_pchol2d.py).
    """
    nbr, nbc = K_loc.shape[0], K_loc.shape[1]
    nb = nbr * pr
    r, c, gi, gj = _grid_ids(nbr, nbc, pr, pc)

    if not lookahead:
        for k in range(nb):                              # static unroll
            K_loc, prow, pcol = _pchol2d_panel(K_loc, k, pr, pc, r, c,
                                               gi, gj)
            # 5. trailing update on the static conservative corner:
            #    boundary blocks with global index <= k are exact zeros
            #    in prow/pcol
            li0, lj0 = (k + 1) // pr, (k + 1) // pc
            if li0 < nbr and lj0 < nbc:
                upd = jnp.einsum("iak,jbk->ijab", prow[li0:], pcol[lj0:])
                K_loc = K_loc.at[li0:, lj0:].add(-upd)
        return K_loc

    # one-panel lookahead pipeline
    K_loc, prow, pcol = _pchol2d_panel(K_loc, 0, pr, pc, r, c, gi, gj)
    for k in range(nb):                                  # static unroll
        li0, lj0 = (k + 1) // pr, (k + 1) // pc
        if k + 1 < nb:
            # (a) narrow update: finalize panel k+1's local column.
            #     Every block with gi > k sits at local row >= li0
            #     ((k+1)//pr * pr <= k+1 bounds gi <= k below it); on
            #     grid columns where gj[lj0] != k+1 the slice is either
            #     a boundary no-op (pcol zero) or a legitimate early
            #     piece of the trailing update.
            if li0 < nbr and lj0 < nbc:
                upd = jnp.einsum("iak,bk->iab", prow[li0:], pcol[lj0])
                K_loc = K_loc.at[li0:, lj0].add(-upd)
            # (b) factor/TRSM panel k+1 and ISSUE its broadcasts now
            K_loc, prow_n, pcol_n = _pchol2d_panel(K_loc, k + 1, pr, pc,
                                                   r, c, gi, gj)
            # (c) wide remainder of panel k's trailing update — the MXU
            #     GEMM the broadcasts above hide behind
            if li0 < nbr and lj0 + 1 < nbc:
                upd = jnp.einsum("iak,jbk->ijab", prow[li0:],
                                 pcol[lj0 + 1:])
                K_loc = K_loc.at[li0:, lj0 + 1:].add(-upd)
            prow, pcol = prow_n, pcol_n
    return K_loc


def plogdet2d_local(L_loc, pr: int, pc: int):
    """log|K| = 2 sum log diag(L) over the grid."""
    nbr, nbc, B = L_loc.shape[0], L_loc.shape[1], L_loc.shape[2]
    _, _, gi, gj = _grid_ids(nbr, nbc, pr, pc)
    on_diag = gi[:, None] == gj[None, :]                 # (nbr, nbc)
    d = jnp.diagonal(L_loc, axis1=2, axis2=3)            # (nbr, nbc, B)
    s = jnp.sum(jnp.where(on_diag[:, :, None], jnp.log(d), 0.0))
    return jax.lax.psum(jax.lax.psum(2.0 * s, AXR), AXC)


def psolve2d_lower_local(L_loc, rhs, pr: int, pc: int):
    """Solve L W = rhs with rhs (N,) or (N, T) REPLICATED; returns W
    replicated in rhs's shape.

    Row k of L is spread over grid row k%Pr: each panel costs two
    O(B T) psums — O(N T) comm per solve, negligible next to the
    factorization (the counted comm model, BASELINE.md round 4 — the
    term that keeps grid SERVING off the 1-D 4N^2 all-gather ring).
    """
    nbr, nbc, B = L_loc.shape[0], L_loc.shape[1], L_loc.shape[2]
    nb = nbr * pr
    r, c, gi, gj = _grid_ids(nbr, nbc, pr, pc)
    vec = rhs.ndim == 1
    R = rhs[:, None] if vec else rhs                     # (N, T)
    T = R.shape[1]
    w = jnp.zeros_like(R)
    for k in range(nb):
        orow, oc = k % pr, k % pc
        li, lj = k // pr, k // pc
        wj = w.reshape(nb, B, T)[gj]                     # (nbc, B, T)
        Lrow = jnp.where(((gj < k) & (r == orow))[:, None, None],
                         L_loc[li], 0.0)
        part = jnp.einsum("jab,jbt->at", Lrow, wj)       # (B, T)
        part = jax.lax.psum(jax.lax.psum(part, AXC), AXR)
        Lkk = _replicate_from(L_loc[li, lj], orow, oc, r, c)
        wk = solve_triangular(jnp.tril(Lkk),
                              R.reshape(nb, B, T)[k] - part, lower=True)
        w = w.reshape(nb, B, T).at[k].set(wk).reshape(-1, T)
    return w[:, 0] if vec else w


def psolve2d_lower_t_local(L_loc, rhs, pr: int, pc: int):
    """Solve L^T X = rhs (back-substitution), rhs (N,) or (N, T)
    replicated.

    Column k of L is spread over grid column k%Pc (rows i%Pr)."""
    nbr, nbc, B = L_loc.shape[0], L_loc.shape[1], L_loc.shape[2]
    nb = nbr * pr
    r, c, gi, gj = _grid_ids(nbr, nbc, pr, pc)
    vec = rhs.ndim == 1
    R = rhs[:, None] if vec else rhs                     # (N, T)
    T = R.shape[1]
    x = jnp.zeros_like(R)
    for k in range(nb - 1, -1, -1):
        orow, oc = k % pr, k % pc
        li, lj = k // pr, k // pc
        xi = x.reshape(nb, B, T)[gi]                     # (nbr, B, T)
        Lcol = jnp.where(((gi > k) & (c == oc))[:, None, None],
                         L_loc[:, lj], 0.0)
        part = jnp.einsum("iab,iat->bt", Lcol, xi)       # (B, T)
        part = jax.lax.psum(jax.lax.psum(part, AXR), AXC)
        Lkk = _replicate_from(L_loc[li, lj], orow, oc, r, c)
        xk = solve_triangular(jnp.tril(Lkk),
                              R.reshape(nb, B, T)[k] - part,
                              lower=True, trans=1)
        x = x.reshape(nb, B, T).at[k].set(xk).reshape(-1, T)
    return x[:, 0] if vec else x


def _build_k_local(kernel: KernelSpec, hyp, x_pad, n_real: int,
                   pr: int, pc: int, block: int):
    """This device's (nbr, nbc, B, B) tiles of K_pad = K + sn2 I (real
    rows; pad rows/cols = identity, zero cross terms)."""
    N_pad = x_pad.shape[0]
    nb = N_pad // block
    nbr, nbc = nb // pr, nb // pc
    r, c, gi, gj = _grid_ids(nbr, nbc, pr, pc)
    nc = kernel.num_hyp(x_pad.shape[1])
    chyp = hyp[:nc]
    row_ids = (gi[:, None] * block + jnp.arange(block)[None, :]).reshape(-1)
    col_ids = (gj[:, None] * block + jnp.arange(block)[None, :]).reshape(-1)
    k = kernel.k(chyp, x_pad[row_ids], x_pad[col_ids])   # (nbr*B, nbc*B)
    pad = (row_ids[:, None] >= n_real) | (col_ids[None, :] >= n_real)
    eye = (row_ids[:, None] == col_ids[None, :]).astype(k.dtype)
    k = jnp.where(pad, eye, k + hyp_sn2(hyp) * eye)
    return (k.reshape(nbr, block, nbc, block).transpose(0, 2, 1, 3),
            row_ids, col_ids)


def pnll_vg2d_local(kernel: KernelSpec, hyp, x_pad, y_pad, n_real: int,
                    pr: int, pc: int, block: int):
    """(NLL, dNLL/dhyp) on the 2-D grid; both psum-replicated.

    The analytic assembly mirrors pgp.pnll_vg_local (GP.cpp:151-171):
    Q tiles = K^{-1} tiles - alpha_i alpha_j^T, contracted against a
    per-device rebuild of its OWN K tiles via vjp (no collectives inside
    the vjp).  K^{-1} tiles come from pinv2d + the SUMMA pkinv2d — the
    ~33% extra gradient FLOPs vs the 1-D streamed layout buy the 4x DCN
    cut (module docstring; BASELINE.md round-4 comm model).
    """
    N_pad = x_pad.shape[0]
    nb = N_pad // block
    nbr, nbc = nb // pr, nb // pc
    nc = kernel.num_hyp(x_pad.shape[1])
    chyp = hyp[:nc]
    sn2 = hyp_sn2(hyp)

    K_loc, row_ids, col_ids = _build_k_local(kernel, hyp, x_pad, n_real,
                                             pr, pc, block)
    L_loc = pchol2d_local(K_loc, pr, pc)
    r_full = jnp.where(jnp.arange(N_pad) < n_real,
                       y_pad - hyp_mean(hyp), 0.0)
    w = psolve2d_lower_local(L_loc, r_full, pr, pc)
    nll = (0.5 * jnp.dot(w, w) + 0.5 * plogdet2d_local(L_loc, pr, pc)
           + 0.5 * n_real * jnp.log(2 * jnp.pi))

    alpha = psolve2d_lower_t_local(L_loc, w, pr, pc)     # replicated (N,)
    W_loc = pinv2d_local(L_loc, pr, pc)
    Kinv_loc = pkinv2d_local(W_loc, pr, pc)              # full tiles

    a_i = alpha[row_ids]                                 # (nbr*B,)
    a_j = alpha[col_ids]                                 # (nbc*B,)
    real_i = row_ids < n_real
    real_j = col_ids < n_real
    Q = (Kinv_loc.transpose(0, 2, 1, 3).reshape(nbr * block, nbc * block)
         - a_i[:, None] * a_j[None, :])
    # padded rows/cols are constants of the builder: zero cotangent
    Q = jnp.where(real_i[:, None] & real_j[None, :], Q, 0.0)

    x_i = x_pad[row_ids]
    x_j = x_pad[col_ids]
    _, vjp = jax.vjp(lambda ch: kernel.k(ch, x_i, x_j), chyp)
    g_cov = 0.5 * jax.lax.psum(jax.lax.psum(vjp(Q)[0], AXR), AXC)

    # tr(Q) over the real diagonal: this device's diagonal entries are
    # where a row id equals a col id
    on_diag = (row_ids[:, None] == col_ids[None, :]) & real_i[:, None]
    tr_loc = jnp.sum(jnp.where(on_diag, Q, 0.0))
    g_sn = sn2 * jax.lax.psum(jax.lax.psum(tr_loc, AXR), AXC)
    g_mean = -jnp.sum(jnp.where(jnp.arange(N_pad) < n_real, alpha, 0.0))

    grad = jnp.concatenate([g_cov, jnp.array([g_sn, g_mean], hyp.dtype)])
    return nll, grad


def pnll2d_local(kernel: KernelSpec, hyp, x_pad, y_pad, n_real: int,
                 pr: int, pc: int, block: int):
    """Distributed NLL value on the 2-D layout (GP.cpp:120-148 semantics;
    NaN/inf propagate — caller sanitizes)."""
    K_loc, _, _ = _build_k_local(kernel, hyp, x_pad, n_real, pr, pc, block)
    L_loc = pchol2d_local(K_loc, pr, pc)
    r_full = jnp.where(jnp.arange(x_pad.shape[0]) < n_real,
                       y_pad - hyp_mean(hyp), 0.0)
    w = psolve2d_lower_local(L_loc, r_full, pr, pc)
    data_fit = 0.5 * jnp.dot(w, w)         # r^T K^-1 r = ||L^-1 r||^2
    logdet = plogdet2d_local(L_loc, pr, pc)
    return (data_fit + 0.5 * logdet
            + 0.5 * n_real * jnp.log(2 * jnp.pi))


def pinv2d_local(L_loc, pr: int, pc: int):
    """W = L^{-1} on the 2-D grid (identity-RHS forward TRSM).

    Row-block forward substitution (the grid analog of
    pchol.pinv_rows_local): at panel k the running RHS's row k is already
    local to grid row k%Pr (spread over columns), so the TRSM itself
    needs no gather — only the update's two operands are broadcast, with
    the same row/col pattern (and the same DCN accounting) as the
    factorization.  W's triangularity is exploited via the static
    conservative column bound (blocks j > k are exact zeros): ~N^3/3P
    update FLOPs.
    """
    nbr, nbc, B = L_loc.shape[0], L_loc.shape[1], L_loc.shape[2]
    nb = nbr * pr
    r, c, gi, gj = _grid_ids(nbr, nbc, pr, pc)

    W = jnp.zeros_like(L_loc)
    # running RHS: identity blocks; R[i, j] only ever nonzero for j <= i
    eye = jnp.eye(B, dtype=L_loc.dtype)
    R = jnp.where((gi[:, None] == gj[None, :])[:, :, None, None],
                  eye[None, None], 0.0)
    for k in range(nb):                                  # static unroll
        orow, oc = k % pr, k % pc
        li = k // pr
        lj_end = k // pc + 1                             # cols with gj <= k
        # 1. TRSM row k against replicated Lkk (local on grid row orow)
        Lkk = _replicate_from(L_loc[li, k // pc], orow, oc, r, c)
        Rrow = R[li, :lj_end]                            # (lj_end, B, B)
        wk = solve_triangular(
            jnp.tril(Lkk), Rrow.transpose(1, 0, 2).reshape(B, -1),
            lower=True).reshape(B, lj_end, B).transpose(1, 0, 2)
        wk = jnp.where(((gj[:lj_end] <= k) & (r == orow))[:, None, None],
                       wk, 0.0)
        W = W.at[li, :lj_end].set(
            jnp.where(r == orow, wk, W[li, :lj_end]))

        # 2. broadcasts for the update R[i, j] -= L[i, k] wk[j]:
        #    L[i, k] for MY rows (row-broadcast from grid column oc)
        Lcol = jnp.where(((gi > k) & (c == oc))[:, None, None],
                         L_loc[:, k // pc], 0.0)
        Lrow_b = jax.lax.psum(Lcol, AXC)                 # (nbr, B, B)
        #    wk[j] for MY cols (col-broadcast from grid row orow)
        wcol_b = jax.lax.psum(
            jnp.where(r == orow, wk, jnp.zeros_like(wk)), AXR)

        li0 = (k + 1) // pr
        if li0 < nbr:
            upd = jnp.einsum("iab,jbc->ijac", Lrow_b[li0:], wcol_b)
            R = R.at[li0:, :lj_end].add(-upd)
    return W


def pkinv2d_local(W_loc, pr: int, pc: int):
    """K^{-1} tiles = (W^T W) on the grid, SUMMA over W's block rows.

    Per step k, W's row k is delivered in two hops: a col-broadcast from
    grid row k%Pr (each device gets its grid-COLUMN subset — the right
    operand, and the only DCN-crossing hop when "rowg" spans hosts) and
    an intra-grid-row redistribution (psum over "colg") that converts it
    to the grid-ROW subset (the left operand).  Triangularity: W[k, i]
    is exactly zero for i > k, so the accumulation slices to the static
    conservative corner — ~2N^3/3P FLOPs (vs N^3/2P for the 1-D
    streamed SYRK: the 2-D layout trades ~33% more gradient FLOPs for
    the 4x DCN cut; BASELINE.md round 4).
    """
    nbr, nbc, B = W_loc.shape[0], W_loc.shape[1], W_loc.shape[2]
    nb = nbr * pr
    r, c, gi, gj = _grid_ids(nbr, nbc, pr, pc)

    Kinv = jnp.zeros_like(W_loc)
    for k in range(nb):                                  # static unroll
        orow = k % pr
        li = k // pr
        lj_end = k // pc + 1
        # hop 1: W[k, j] for MY grid-column ids (j <= k) — psum over AXR
        wrow = jnp.where(((gj[:lj_end] <= k) & (r == orow))[:, None, None],
                         W_loc[li, :lj_end], 0.0)
        wj = jax.lax.psum(wrow, AXR)                     # (lj_end, B, B)
        # hop 2: convert to MY grid-ROW ids via in-row redistribution.
        # target slot m: global i_m = m*pr + r, needed for i_m <= k;
        # source column holds it at slot (i_m - c)/pc iff i_m ≡ c (mod pc)
        li_end = k // pr + 1
        im = gi[:li_end]                                 # (li_end,)
        src = jnp.clip((im - c) // pc, 0, lj_end - 1)
        have = ((im % pc) == c) & (im <= k)
        cand = jnp.take(wj, src, axis=0)                 # (li_end, B, B)
        wi = jax.lax.psum(
            jnp.where(have[:, None, None], cand, 0.0), AXC)
        # accumulate tiles [i, j] += W[k,i]^T W[k,j] on the static corner
        upd = jnp.einsum("iab,jac->ijbc", wi, wj)
        Kinv = Kinv.at[:li_end, :lj_end].add(upd)
    return Kinv


# --------------------------------------------------------------------------
# Jitted wrappers
# --------------------------------------------------------------------------

def _pad_xy(x, y, pr: int, pc: int, block: int):
    n = x.shape[0]
    pad = pad_amount(n, pr, pc, block)
    pchol.check_shard_addressable(n + pad, pr * pc)
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)])
        y = jnp.concatenate([y, jnp.zeros((pad,), y.dtype)])
    return x, y, n


@partial(jax.jit, static_argnames=("kernel", "n_real", "pr", "pc", "block",
                                   "mesh"))
def _pnll2d_program(kernel, hyp, x_pad, y_pad, n_real, pr, pc, block, mesh):
    body = lambda h, x, y: pnll2d_local(kernel, h, x, y, n_real, pr, pc,
                                        block)
    return shard_map(body, mesh=mesh, in_specs=(P(), P(), P()),
                     out_specs=P(), check_vma=False)(hyp, x_pad, y_pad)


@partial(jax.jit, static_argnames=("kernel", "n_real", "pr", "pc", "block",
                                   "mesh"))
def _pnll_vg2d_program(kernel, hyp, x_pad, y_pad, n_real, pr, pc, block,
                       mesh):
    body = lambda h, x, y: pnll_vg2d_local(kernel, h, x, y, n_real, pr,
                                           pc, block)
    return shard_map(body, mesh=mesh, in_specs=(P(), P(), P()),
                     out_specs=(P(), P()), check_vma=False)(hyp, x_pad,
                                                            y_pad)


def pnll_vg2d(kernel: KernelSpec, hyp, x, y, mesh: Mesh,
              block: int | None = None):
    """Distributed (NLL, grad) on the 2-D grid; INF-sanitized — the
    full training-step evaluation on the DCN-lean layout (pgp.pnll_vg's
    grid twin)."""
    pr, pc = mesh.shape[AXR], mesh.shape[AXC]
    if block is None:
        block = pchol.auto_block(np.asarray(x).shape[0], pr * pc)
    x_pad, y_pad, n = _pad_xy(jnp.asarray(x), jnp.asarray(y), pr, pc, block)
    f, g = _pnll_vg2d_program(kernel, jnp.asarray(hyp, x_pad.dtype),
                              x_pad, y_pad, n, pr, pc, block, mesh)
    return sanitize_value_and_grad(f, g)


def pfit2d_hosted(kernel: KernelSpec, noise_free: bool, x, y, vec0, lb, ub,
                  mesh: Mesh, block: int | None = None,
                  max_evals: int = 160):
    """Bounded MLE fit on the 2-D grid, L-BFGS-B driven from the host —
    each evaluation is ONE grid program (pnll_vg2d).  The hosted loop is
    the right default at the multi-host scale this layout targets (the
    same ~60-100 s single-execution watchdog argument as
    pgp.pfit_hosted; evaluations are seconds each there anyway).

    Float32 note: pass STANDARDIZED targets, as with pgp.pfit.
    """
    from ..optim.lbfgsb import lbfgsb_hosted

    pr, pc = mesh.shape[AXR], mesh.shape[AXC]
    if block is None:
        block = pchol.auto_block(np.asarray(x).shape[0], pr * pc)
    x_pad, y_pad, n = _pad_xy(jnp.asarray(x), jnp.asarray(y), pr, pc, block)
    dt = x_pad.dtype

    def fun(v):
        hyp = from_opt_vec(v, noise_free)
        f, g = _pnll_vg2d_program(kernel, hyp, x_pad, y_pad, n, pr, pc,
                                  block, mesh)
        gv = jnp.concatenate([g[:-2], g[-1:]]) if noise_free else g
        return sanitize_value_and_grad(f, gv)

    return lbfgsb_hosted(fun, jnp.asarray(vec0, dt), jnp.asarray(lb, dt),
                         jnp.asarray(ub, dt), max_evals=max_evals)


def pnll2d(kernel: KernelSpec, hyp, x, y, mesh: Mesh, block: int | None = None):
    """Distributed exact-GP NLL over a 2-D ("rowg", "colg") mesh.

    The serving/posterior-scale entry for multi-host meshes where DCN
    bandwidth, not ICI, is the constraint (module docstring).  INF-
    sanitized like pgp.pnll_vg."""
    pr, pc = mesh.shape[AXR], mesh.shape[AXC]
    if block is None:
        block = pchol.auto_block(np.asarray(x).shape[0], pr * pc)
    x_pad, y_pad, n = _pad_xy(jnp.asarray(x), jnp.asarray(y), pr, pc, block)
    f = _pnll2d_program(kernel, jnp.asarray(hyp, x_pad.dtype), x_pad,
                        y_pad, n, pr, pc, block, mesh)
    g = jnp.zeros((1,), x_pad.dtype)
    return sanitize_value_and_grad(f, g)[0]


# --------------------------------------------------------------------------
# Grid posterior cache + serving (GP::_setK / GP::_predict at pod scale —
# GP.cpp:423-444, 273-297 — entirely on the DCN-lean layout: no 1-D
# fallback, so rescue attempts and variance batches never re-enter the
# 4N^2 all-gather ring the grid exists to avoid)
# --------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("kernel", "n_real", "pr", "pc", "block",
                                   "mesh"))
def _pfactor2d_program(kernel, hyp, x_pad, y_pad, n_real, pr, pc, block,
                       mesh):
    """Factor K(hyp) on the grid; return (L grid-sharded
    (pr, pc, nbr, nbc, B, B), ok, invKys replicated)."""
    def body(hyp, x, y):
        K_loc, row_ids, col_ids = _build_k_local(kernel, hyp, x, n_real,
                                                 pr, pc, block)
        nbr, nbc = K_loc.shape[0], K_loc.shape[1]
        _, _, gi, gj = _grid_ids(nbr, nbc, pr, pc)
        L_loc = pchol2d_local(K_loc, pr, pc)
        # ok = every grid-diagonal block's diagonal finite and positive
        on_diag = (gi[:, None] == gj[None, :])[:, :, None]   # (nbr,nbc,1)
        d = jnp.diagonal(L_loc, axis1=2, axis2=3)            # (nbr,nbc,B)
        bad = jnp.sum(jnp.where(on_diag & ~(jnp.isfinite(d) & (d > 0)),
                                1, 0))
        ok = jax.lax.psum(jax.lax.psum(bad, AXR), AXC) == 0
        r_full = jnp.where(jnp.arange(x.shape[0]) < n_real,
                           y - hyp_mean(hyp), 0.0)
        w = psolve2d_lower_local(L_loc, r_full, pr, pc)
        invKys = psolve2d_lower_t_local(L_loc, w, pr, pc)    # replicated
        return L_loc[None, None], ok, invKys

    return shard_map(body, mesh=mesh, in_specs=(P(), P(), P()),
                     out_specs=(P(AXR, AXC), P(), P()),
                     check_vma=False)(hyp, x_pad, y_pad)


def pset_k2d(kernel: KernelSpec, hyp, x, y, mesh: Mesh,
             block: int | None = None, max_tries: int = 32):
    """Grid posterior cache with the reference's noise-inflation rescue
    (GP::_setK, GP.cpp:423-444): while the grid Cholesky fails,
    log sigma_n += log sqrt(10) (restarting at log eps from -inf) — each
    attempt is one grid program, so EVERY rescue round stays on the
    DCN-lean layout (the 1-D route prices each attempt at 4N^2
    host-crossing bytes; here it is 8N^2/Pc — BASELINE.md round 4).

    Returns (hyp', L (pr, pc, nbr, nbc, B, B) grid-sharded, invKys (N,)
    replicated, ok).  `ok` False only when every one of max_tries
    inflation rounds still failed — L/invKys then contain NaN and MUST
    NOT be cached as a serving posterior (callers raise: fail-loud
    contract, models/exact.py)."""
    pr, pc = mesh.shape[AXR], mesh.shape[AXC]
    if block is None:
        block = pchol.auto_block(np.asarray(x).shape[0], pr * pc)
    x_pad, y_pad, n = _pad_xy(jnp.asarray(x), jnp.asarray(y), pr, pc, block)
    hyp = jnp.asarray(hyp, x_pad.dtype)
    eps = float(jnp.finfo(x_pad.dtype).eps)

    log_sn = float(hyp[-2])
    ok = False
    for _ in range(max_tries):
        L, ok, invKys = _pfactor2d_program(
            kernel, hyp.at[-2].set(log_sn), x_pad, y_pad, n, pr, pc,
            block, mesh)
        if bool(ok):
            break
        log_sn = (np.log(eps) if np.isinf(log_sn)
                  else log_sn + 0.5 * np.log(10.0))
    hyp = hyp.at[-2].set(log_sn)
    return hyp, L, invKys[:n], bool(ok)


@partial(jax.jit, static_argnames=("pr", "pc", "mesh"))
def _pquad2d_program(kt_pad, L, pr, pc, mesh):
    """sum(k* o K^{-1} k*) per test point via the grid forward solve:
    quad_t = ||L^{-1} kt_t||^2.  O(N^2 T / P) FLOPs, O(N T) comm — the
    counted model's serving term (no N^2-scale collective)."""
    def body(L, kt):
        Z = psolve2d_lower_local(L[0, 0], kt, pr, pc)    # (N_pad, T) repl
        return jnp.sum(Z * Z, axis=0)

    return shard_map(body, mesh=mesh, in_specs=(P(AXR, AXC), P()),
                     out_specs=P(), check_vma=False)(L, kt_pad)


@partial(jax.jit, static_argnames=("pr", "pc", "mesh"))
def _psolve2d_columns(kt_pad, L, pr, pc, mesh):
    """K^{-1} kt for T columns via the grid solve; replicated (N_pad, T)."""
    def body(L, kt):
        Z = psolve2d_lower_local(L[0, 0], kt, pr, pc)
        return psolve2d_lower_t_local(L[0, 0], Z, pr, pc)

    return shard_map(body, mesh=mesh, in_specs=(P(AXR, AXC), P()),
                     out_specs=P(), check_vma=False)(L, kt_pad)


@partial(jax.jit, static_argnames=("kernel", "n_real", "pr", "pc", "block",
                                   "mesh"))
def _ppredict2d_program(kernel, hyp, x_pad, L, invKys, xs, n_real, pr, pc,
                        block, mesh):
    """Fully-jitted grid predict (multi-host safe: every op on the global
    arrays happens inside this one program) — pgp._ppredict_program's
    grid twin."""
    nc = kernel.num_hyp(x_pad.shape[1])
    chyp = hyp[:nc]
    kt = kernel.k(chyp, xs, x_pad[:n_real])              # (T, N)
    mu = hyp_mean(hyp) + kt @ invKys
    kt_pad = jnp.zeros((x_pad.shape[0], xs.shape[0]), x_pad.dtype
                       ).at[:n_real, :].set(kt.T)
    quad = _pquad2d_program.__wrapped__(kt_pad, L, pr, pc, mesh)
    s2 = jnp.maximum(kernel.diag_k(chyp, xs) - quad, 0.0) + hyp_sn2(hyp)
    return mu, s2


def _pad_x_for_grid(x, pr: int, pc: int, block: int):
    x = jnp.asarray(x)
    return _pad_xy(x, jnp.zeros((x.shape[0],), x.dtype), pr, pc, block)


def ppredict2d(kernel: KernelSpec, hyp, x, L, invKys, xs, mesh: Mesh,
               block: int | None = None):
    """Grid batch posterior (GP::_predict semantics, GP.cpp:273-297):
    mean via the cached invKys (O(NT)), variance via the grid solve.

    `block` defaults to the factor's own blocking (L is
    (pr, pc, nbr, nbc, B, B))."""
    pr, pc = mesh.shape[AXR], mesh.shape[AXC]
    if block is None:
        block = int(L.shape[4])
    x = jnp.asarray(x)
    xs = jnp.asarray(xs, x.dtype)
    x_pad, _, n = _pad_x_for_grid(x, pr, pc, block)
    hyp = jnp.asarray(hyp, x.dtype)
    nc = kernel.num_hyp(x.shape[1])
    chyp = hyp[:nc]

    # one (T, N) cross-covariance build serves both mean and variance
    kt = kernel.k(chyp, xs, x)                           # (T, N)
    mu = hyp_mean(hyp) + kt @ invKys
    kt_pad = jnp.zeros((x_pad.shape[0], xs.shape[0]), x.dtype
                       ).at[:n, :].set(kt.T)
    quad = _pquad2d_program(kt_pad, L, pr, pc, mesh)
    s2 = jnp.maximum(kernel.diag_k(chyp, xs) - quad, 0.0) + hyp_sn2(hyp)
    return mu, s2


def ppredict2d_with_grad(kernel: KernelSpec, hyp, x, L, invKys, xs,
                         mesh: Mesh, block: int | None = None):
    """(y, gy, s2, gs2) off the GRID posterior — the BO acquisition path
    (GP.cpp:284-296 semantics: gy = dk*/dx . invKys, gs2 = -2 dk*/dx .
    (K^{-1} k*), the variance clamp excluded from the gradient); the 2-D
    twin of pgp.ppredict_with_grad."""
    pr, pc = mesh.shape[AXR], mesh.shape[AXC]
    if block is None:
        block = int(L.shape[4])
    x = jnp.asarray(x)
    xs = jnp.asarray(xs, x.dtype)
    x_pad, _, n = _pad_x_for_grid(x, pr, pc, block)
    hyp = jnp.asarray(hyp, x.dtype)
    nc = kernel.num_hyp(x.shape[1])
    chyp = hyp[:nc]

    kt = kernel.k(chyp, xs, x)                           # (T, N)
    kt_pad = jnp.zeros((x_pad.shape[0], xs.shape[0]), x.dtype
                       ).at[:n, :].set(kt.T)
    kks = _psolve2d_columns(kt_pad, L, pr, pc, mesh)[:n]  # (N, T)

    yfun = lambda xi: hyp_mean(hyp) + jnp.dot(
        kernel.k(chyp, xi[None, :], x)[0], invKys)
    y, gy = jax.vmap(jax.value_and_grad(yfun))(xs)

    sf2 = kernel.diag_k(chyp, xs)
    s2 = jnp.maximum(sf2 - jnp.einsum("tn,nt->t", kt, kks), 0.0) \
        + hyp_sn2(hyp)

    def gs2_one(xi, kks_t):
        _, vjp = jax.vjp(lambda z: kernel.k(chyp, z[None, :], x)[0], xi)
        return vjp(-2.0 * kks_t)[0]

    gs2 = jax.vmap(gs2_one)(xs, kks.T)
    return y, gy, s2, gs2
