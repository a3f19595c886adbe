"""Distributed blocked Cholesky + triangular solves over a device mesh.

TPU-native replacement for the reference's MatrixSolver O(N^3) core
(MatrixSolver.{h,cpp}) at pod scale: the N x N kernel matrix is block-row
sharded BLOCK-CYCLICALLY over mesh axis `rows`, and a right-looking blocked
Cholesky runs as per-device code inside `shard_map`:

  panel j:  owner factors the BxB diagonal block        (small, serial)
            every device right-solves its local panel    (TRSM, local)
            panel is all-gathered over ICI               (N x B per step)
            trailing update is one local matmul per chip (MXU, the FLOPs)

Block-cyclic layout keeps the shrinking trailing matrix balanced across
devices (classic ScaLAPACK layout).  It is expressed with pure reshapes:
a (N, ...) array in "G-layout" has shape (nbl, P, B, ...) where entry
[l, q] holds row-block g = l*P + q, and sharding axis 1 over the mesh gives
device p exactly the blocks {g : g mod P == p}.

All functions ending in `_local` run INSIDE shard_map (arguments are the
per-device shards; `axis_name` names the mesh axis).  The module-level
wrappers in pgp.py assemble them into jitted programs.

Loops over the nb panels are Python-unrolled: panel index j is static, so
every slice is static and the trailing matmul SHRINKS with j (no masked
full-width updates, no wasted FLOPs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from ..ops.slabbed import MAX_SLAB_ELEMS


# --------------------------------------------------------------------------
# Layout helpers (host or trace time)
# --------------------------------------------------------------------------

def blocked_layout(a, n_dev: int, block: int):
    """(N, ...) -> G-layout (nbl, P, B, ...): [l, q] = row-block l*P + q."""
    n = a.shape[0]
    nb = n // block
    assert nb % n_dev == 0 and n == nb * block, (
        f"N={n} must be a multiple of n_dev*block={n_dev * block}")
    return a.reshape(nb // n_dev, n_dev, block, *a.shape[1:])


def unblocked_layout(a):
    """G-layout (nbl, P, B, ...) -> natural (N, ...)."""
    nbl, p, b = a.shape[:3]
    return a.reshape(nbl * p * b, *a.shape[3:])


def pad_amount(n: int, n_dev: int, block: int) -> int:
    q = n_dev * block
    return (-n) % q


def max_safe_n(n_dev: int) -> int:
    """Largest N whose per-device (nbl, B, N_pad) shard stays int32-safe."""
    return int((MAX_SLAB_ELEMS * n_dev) ** 0.5)


def check_shard_addressable(n_pad: int, n_dev: int) -> None:
    """Refuse per-device shards past XLA:TPU's proven int32-safe bound.

    The distributed factorization keeps each device's row blocks as ONE
    (nbl, B, N_pad) buffer of n_pad^2 / n_dev elements and updates it in
    place per panel.  On XLA:TPU, in-place fused updates on any buffer
    past 2^30 elements SILENTLY corrupt (measured at N=51200 single-chip:
    0.68 absolute error in `L.at[c1:, c1:].add(-(pan @ pan.T))` while every
    individual slice/DUS/GEMM on the same buffer is correct — see
    ops/slabbed.py's module docstring; 2^30 is the verified-clean bound).
    Virtual-CPU-mesh tests cannot catch this (the defect is XLA:TPU
    code-gen), so the wall must be a hard wrapper-level error, never a
    silent wrong answer.
    """
    elems = n_pad * n_pad // n_dev
    if elems > MAX_SLAB_ELEMS:
        need = -(-n_pad * n_pad // MAX_SLAB_ELEMS)
        raise ValueError(
            f"distributed shard of {elems} elements per device "
            f"(N_pad={n_pad} over {n_dev} devices) exceeds the proven "
            f"int32-safe in-place-update bound of 2^30 elements on "
            f"XLA:TPU; use >= {need} devices for this N "
            f"(max safe N at {n_dev} devices: {max_safe_n(n_dev)})")


def auto_block(n: int, n_dev: int, max_panels: int = 28,
               min_block: int = 256) -> int:
    """Panel width keeping the unrolled panel count bounded.

    The factorization unrolls nb = N/(P*B) panels into the jitted program;
    measured compile time grows ~quadratically in nb (8-device virtual
    mesh: 25 panels -> 110 s, 49 panels -> 529 s at N=100k, back to 89 s
    at N=200k with B=1024).  Keeping nb <= max_panels bounds compile cost
    at any N while the per-panel GEMMs only get larger (better for the
    MXU).  Returns a multiple of min_block.
    """
    b = -(-n // (n_dev * max_panels))           # ceil
    return max(min_block, -(-b // min_block) * min_block)


# --------------------------------------------------------------------------
# In-shard_map building blocks
# --------------------------------------------------------------------------

def _local_blocks(nbl: int, n_dev: int, axis_name: str):
    """Global block indices g of this device's local blocks (traced)."""
    p = jax.lax.axis_index(axis_name)
    return jnp.arange(nbl) * n_dev + p


def _pchol_panel(K_loc, j: int, n_dev: int, axis_name: str):
    """Steps 1-2 of panel j: factor the diagonal block on its owner,
    broadcast it, local panel TRSM, mask to the below-panel blocks.
    Returns the (nbl, B, B) panel (finalized columns [j*B, (j+1)*B))."""
    nbl, B, N = K_loc.shape
    p = jax.lax.axis_index(axis_name)
    g = _local_blocks(nbl, n_dev, axis_name)
    lj, owner = j // n_dev, j % n_dev
    c0, c1 = j * B, (j + 1) * B

    # 1. factor the diagonal block on its owner, broadcast over ICI
    diag = K_loc[lj, :, c0:c1]
    Ljj = jnp.linalg.cholesky(diag)
    Ljj = jax.lax.psum(
        jnp.where(p == owner, Ljj, jnp.zeros_like(Ljj)), axis_name)

    # 2. local panel TRSM:  X = K[:, j] Ljj^{-T}  for blocks below j
    cols = K_loc[:, :, c0:c1]                            # (nbl, B, B)
    X = solve_triangular(
        Ljj, cols.reshape(nbl * B, B).T, lower=True).T.reshape(nbl, B, B)
    below = (g > j)[:, None, None]
    panel = jnp.where(below, X, 0.0)
    return jnp.where((g == j)[:, None, None], jnp.tril(Ljj)[None], panel)


def _gather_panel(panel, axis_name: str):
    """Panel all-gather: (P, nbl, B, B) -> natural-order (N, B)."""
    full = jax.lax.all_gather(panel, axis_name)          # [q, l] = block l*P+q
    q, nbl, B = full.shape[:3]
    return full.transpose(1, 0, 2, 3).reshape(q * nbl * B, B)


def pchol_local(K_loc, n_dev: int, axis_name: str, lookahead: bool = True):
    """Distributed right-looking blocked Cholesky.

    K_loc: (nbl, B, N) — this device's row blocks of the SPD matrix, block
    g = l*P + p, columns in natural order.  Returns L_loc in the same layout
    with exact lower-triangular structure (upper blocks zeroed).  A non-SPD
    input surfaces as NaNs in the factor diagonal (chol_ok semantics,
    ops/chol.py) — the jitter-escalation wrappers detect that.

    No final masking pass: the panel write at step j already stores exact
    zeros above the diagonal of columns [j*B, (j+1)*B), and no later step
    touches those columns (trailing updates only hit columns >= (j+1)*B,
    themselves overwritten by their own panel writes) — so the factor
    leaves the loop with exact lower-triangular structure.  The N^2/P
    broadcast-compare select this replaces cost a measured 4.7 ms at
    N=16384 on the single-chip path (ops/blocked.py zero_upper=False).

    lookahead=True (default) pipelines the panels one step ahead: the
    trailing update with panel j is split into the NARROW slice that
    finalizes panel j+1's columns (applied first) and the WIDE remainder
    — panel j+1 is then factored/TRSM'd and its all_gather ISSUED before
    the wide GEMM, so XLA's latency-hiding scheduler overlaps the
    (N x B per panel) collective with the dominant MXU matmul instead of
    serializing nb blocking gathers on the critical path (the term the
    >= 80% 1->2-host scaling target needs hidden on DCN — BASELINE.md
    round-4 comm model).  Identical arithmetic per output element (the
    update is the same contraction applied in two disjoint column
    slices): bitwise-equal factors on the virtual mesh
    (tests/test_pchol.py).
    """
    nbl, B, N = K_loc.shape
    nb = nbl * n_dev

    if not lookahead:
        for j in range(nb):                              # static unroll
            c0, c1 = j * B, (j + 1) * B
            panel = _pchol_panel(K_loc, j, n_dev, axis_name)
            K_loc = K_loc.at[:, :, c0:c1].set(panel)
            full = _gather_panel(panel, axis_name)
            # trailing update (static shrinking width) — the MXU matmul.
            # Local blocks l < (j+1)//P have g = l*P + p <= j on EVERY
            # device: their panel rows are zero (or the finalized
            # diagonal, whose trailing columns get overwritten later), so
            # the update is sliced to start at l0 — the block-cyclic
            # analog of the shrinking trailing matrix, halving update
            # FLOPs vs the full-height einsum (N^3/3 total, not N^3/2).
            l0 = (j + 1) // n_dev
            if c1 < N and l0 < nbl:
                upd = jnp.einsum("lrk,ck->lrc", panel[l0:], full[c1:, :])
                K_loc = K_loc.at[l0:, :, c1:].add(-upd)
        return K_loc

    # one-panel lookahead pipeline
    panel = _pchol_panel(K_loc, 0, n_dev, axis_name)
    K_loc = K_loc.at[:, :, 0:B].set(panel)
    full = _gather_panel(panel, axis_name)
    for j in range(nb):                                  # static unroll
        c1 = (j + 1) * B
        l0 = (j + 1) // n_dev
        if j + 1 < nb:
            c2 = c1 + B
            # (a) narrow update: finalize panel j+1's own columns
            if l0 < nbl:
                upd = jnp.einsum("lrk,ck->lrc", panel[l0:], full[c1:c2, :])
                K_loc = K_loc.at[l0:, :, c1:c2].add(-upd)
            # (b) factor/TRSM panel j+1 and ISSUE its all_gather now
            panel_next = _pchol_panel(K_loc, j + 1, n_dev, axis_name)
            K_loc = K_loc.at[:, :, c1:c2].set(panel_next)
            full_next = _gather_panel(panel_next, axis_name)
            # (c) wide remainder of panel j's trailing update — the MXU
            #     GEMM the gather above hides behind
            if c2 < N and l0 < nbl:
                upd = jnp.einsum("lrk,ck->lrc", panel[l0:], full[c2:, :])
                K_loc = K_loc.at[l0:, :, c2:].add(-upd)
            panel, full = panel_next, full_next
    return K_loc


def plogdet_local(L_loc, n_dev: int, axis_name: str):
    """log|K| = 2 sum log diag(L), psum-reduced.  L_loc in G-layout."""
    nbl, B, N = L_loc.shape
    g = _local_blocks(nbl, n_dev, axis_name)

    def diag_block(Lrow, gi):
        blk = jax.lax.dynamic_slice(Lrow, (0, gi * B), (B, B))
        return jnp.diagonal(blk)

    d = jax.vmap(diag_block)(L_loc, g)                   # (nbl, B)
    return jax.lax.psum(2.0 * jnp.sum(jnp.log(d)), axis_name)


def ptrsm_lower_local(L_loc, R_loc, n_dev: int, axis_name: str):
    """Solve L W = R with both operands row-sharded in G-layout.

    L_loc: (nbl, B, N) lower factor;  R_loc: (nbl, B, T) RHS rows.
    Right-looking fan-out: per panel, the owner solves its BxT block, the
    block is broadcast, and every device updates its below-panel rows with
    one local matmul.  Work N^2 T / (2P) per device, comm N*T total.
    """
    nbl, B, N = L_loc.shape
    nb = nbl * n_dev
    p = jax.lax.axis_index(axis_name)
    g = _local_blocks(nbl, n_dev, axis_name)

    W = R_loc
    for j in range(nb):
        lj, owner = j // n_dev, j % n_dev
        c0, c1 = j * B, (j + 1) * B
        wj = solve_triangular(L_loc[lj, :, c0:c1], W[lj], lower=True)
        wj = jax.lax.psum(
            jnp.where(p == owner, wj, jnp.zeros_like(wj)), axis_name)
        W = W.at[lj].set(jnp.where(p == owner, wj, W[lj]))
        # blocks l < (j+1)//P have g <= j on every device (masked anyway):
        # slice them out of the update GEMM — halves the TRSM FLOPs
        l0 = (j + 1) // n_dev
        if l0 < nbl:
            upd = jnp.einsum("lrk,kt->lrt", L_loc[l0:, :, c0:c1], wj)
            W = W.at[l0:].add(
                -jnp.where((g[l0:] > j)[:, None, None], upd, 0.0))
    return W


def pinv_rows_local(L_loc, n_dev: int, axis_name: str):
    """W = L^{-1}, row-sharded G-layout (nbl, B, N) — the specialized
    forward TRSM with the IDENTITY right-hand side.

    Exploits W's lower-triangular structure, which the generic
    `ptrsm_lower_local(L, eye_rows)` cannot: at panel j the solved block
    wj and every trailing update touch only columns < (j+1)B (the
    identity's block-j rows live there and updates only move mass to
    lower column indices).  Static panel index -> static column slices:

      FLOPs  ~N^3/6P   (vs ~N^3/2P full-width — 3x)
      psum   ~(B, c1) per panel, half the broadcast bytes
      and no (nbl, B, N) one-hot eye build (an N^2/P write pass).

    Feeds the streamed analytic gradient (pgp.pnll_vg_local), where the
    W build is the second-largest term after the factorization itself.
    """
    nbl, B, N = L_loc.shape
    nb = nbl * n_dev
    p = jax.lax.axis_index(axis_name)
    g = _local_blocks(nbl, n_dev, axis_name)

    W = jnp.zeros_like(L_loc)
    # running RHS: identity rows minus accumulated panel contributions;
    # block g's row range only ever holds nonzeros in columns < (g+1)B
    R = (g[:, None] * B + jnp.arange(B)[None, :])[:, :, None]
    R = (R == jnp.arange(N)[None, None, :]).astype(L_loc.dtype)
    for j in range(nb):
        lj, owner = j // n_dev, j % n_dev
        c0, c1 = j * B, (j + 1) * B
        wj = solve_triangular(L_loc[lj, :, c0:c1], R[lj, :, :c1],
                              lower=True)
        wj = jax.lax.psum(
            jnp.where(p == owner, wj, jnp.zeros_like(wj)), axis_name)
        W = W.at[lj, :, :c1].set(jnp.where(p == owner, wj, W[lj, :, :c1]))
        l0 = (j + 1) // n_dev
        if l0 < nbl:
            upd = jnp.einsum("lrk,kc->lrc", L_loc[l0:, :, c0:c1], wj)
            R = R.at[l0:, :, :c1].add(
                -jnp.where((g[l0:] > j)[:, None, None], upd, 0.0))
    return W


def ptrsm_lowerT_local(L_loc, R_loc, n_dev: int, axis_name: str):
    """Solve L^T X = R, row-sharded G-layout (back-substitution).

    Left-looking from the last panel: each device forms the partial sum
    sum_{local g > j} L[g, j]^T x_g, a psum combines them, the owner solves,
    and the solved block is written back.  Returns X in G-layout.
    """
    nbl, B, N = L_loc.shape
    nb = nbl * n_dev
    T = R_loc.shape[-1]
    p = jax.lax.axis_index(axis_name)
    g = _local_blocks(nbl, n_dev, axis_name)

    X = jnp.zeros_like(R_loc)
    Xfull = jnp.zeros((N, T), R_loc.dtype)               # replicated solved rows
    for j in range(nb - 1, -1, -1):
        lj, owner = j // n_dev, j % n_dev
        c0, c1 = j * B, (j + 1) * B
        # partial = sum over local blocks g > j of L[g, j]^T X[g];
        # blocks l < (j+1)//P have g <= j on every device — sliced out
        l0 = (j + 1) // n_dev
        if l0 >= nbl:
            part = jnp.zeros((B, T), R_loc.dtype)
        else:
            Lj = jnp.where((g[l0:] > j)[:, None, None],
                           L_loc[l0:, :, c0:c1], 0.0)
            Xg = jax.vmap(
                lambda gi: jax.lax.dynamic_slice(Xfull, (gi * B, 0), (B, T))
            )(g[l0:])                                    # (nbl-l0, B, T)
            part = jnp.einsum("lkr,lkt->rt", Lj, Xg)
        acc = jax.lax.psum(part, axis_name)
        xj = solve_triangular(L_loc[lj, :, c0:c1], R_loc[lj] - acc,
                              lower=True, trans=1)
        xj = jax.lax.psum(
            jnp.where(p == owner, xj, jnp.zeros_like(xj)), axis_name)
        X = X.at[lj].set(jnp.where(p == owner, xj, X[lj]))
        Xfull = jax.lax.dynamic_update_slice(Xfull, xj, (j * B, 0))
    return X


def pchol_solve_local(L_loc, R_loc, n_dev: int, axis_name: str):
    """Solve (L L^T) X = R, row-sharded G-layout."""
    Z = ptrsm_lower_local(L_loc, R_loc, n_dev, axis_name)
    return ptrsm_lowerT_local(L_loc, Z, n_dev, axis_name)


def pinv_from_chol_local(L_loc, n_dev: int, axis_name: str):
    """K^{-1} = L^{-T} L^{-1}, row-sharded G-layout (nbl, B, N).

    W = L^{-1} via ptrsm with an identity RHS, then the distributed SYRK
    K^{-1}[g-rows] = psum_q  sum_{local l} W[l][:, g-cols]^T W[l],
    streamed one output row-block at a time so per-device peak memory is
    O(B N) on top of the O(N^2/P) shards — never a replicated N x N.
    O(N^3/P) compute, O(N^2) ICI traffic.
    """
    nbl, B, N = L_loc.shape
    nb = nbl * n_dev
    p = jax.lax.axis_index(axis_name)
    g = _local_blocks(nbl, n_dev, axis_name)

    # this device's rows of I, built as one-hots (no N x N eye materialized)
    row_ids = g[:, None] * B + jnp.arange(B)[None, :]    # (nbl, B) global rows
    eye_rows = (row_ids[:, :, None] == jnp.arange(N)[None, None, :]
                ).astype(L_loc.dtype)
    W = ptrsm_lower_local(L_loc, eye_rows, n_dev, axis_name)

    Kinv = jnp.zeros_like(L_loc)
    for gi in range(nb):                                 # static unroll
        lj, owner = gi // n_dev, gi % n_dev
        part = jnp.einsum("lrc,lrn->cn",
                          W[:, :, gi * B:(gi + 1) * B], W)     # (B, N)
        full = jax.lax.psum(part, axis_name)
        Kinv = Kinv.at[lj].set(jnp.where(p == owner, full, Kinv[lj]))
    return Kinv


def pkinv_rowblock_local(W, l: int, n_dev: int, axis_name: str):
    """This device's K^{-1} rows for its local block l, streamed.

    W: (nbl, B, N) row-sharded L^{-1} (from ptrsm_lower_local with one-hot
    identity rows).  K^{-1} = W^T W, so the rows of global blocks
    {l*P + p : p} are the contiguous column slice W[:, :, l*P*B:(l+1)*P*B]
    contracted against all of W — one local sliced SYRK per device — and a
    single psum_scatter both sums the partials over devices AND hands each
    device exactly its own block's (B, N) rows.  Per-call comm is N*B/P
    received per device (vs N*B psum-replicated in pinv_from_chol_local),
    and no (nbl, B, N) K^{-1} buffer is ever materialized: the caller
    consumes each row block immediately (streamed analytic gradient,
    pgp.pnll_vg_local — the shard_map analog of exact.nll_vg_streamed).

    W is EXACTLY lower-triangular (pinv_rows_local builds it from zeros,
    touching only columns < (g+1)B of global row block g), so row blocks
    with g < l*P are zero throughout the column slice [cs, cs+PB): the
    SYRK is sliced to local blocks >= l (g = l'*P + p >= l*P iff
    l' >= l).  Summed over the caller's l-loop this halves the
    contraction FLOPs — ~N^3/2P total instead of ~N^3/P — without
    changing a bit of the output (the dropped terms are exact zeros).
    """
    nbl, B, N = W.shape
    cs = l * n_dev * B
    part = jnp.einsum("lrc,lrn->cn", W[l:, :, cs:cs + n_dev * B], W[l:])
    return jax.lax.psum_scatter(part, axis_name, scatter_dimension=0,
                                tiled=True)
