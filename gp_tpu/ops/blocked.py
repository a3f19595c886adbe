"""Blocked dense Cholesky / TRSM tuned for the TPU MXU.

XLA's stock `jnp.linalg.cholesky` on TPU runs a fori-loop factorization
that reaches only ~6% MXU utilization at N=8k (measured: 13.8 ms at
N=8192 f32 on v5e).  These routines restructure the O(N^3) work into a
statically-unrolled right-looking blocked algorithm whose trailing updates
are LARGE matmuls/SYRKs the MXU executes near peak, leaving only the
small diagonal-block factorizations on the stock path:

    cholesky:  13.8 ms -> ~10 ms single-level; recursion shrinks the
               serial base-case share further.
    trsm(N rhs): 35.3 ms -> ~10.5 ms.

Everything is pure jnp (static shapes, no custom primitives), so
jax.value_and_grad differentiates straight through the blocked structure —
the backward pass is made of the same blocked matmuls and small triangular
solves, which is where the exact-GP NLL gradient (the training hot loop,
SURVEY.md section 3.1) spends its time.

NaN semantics match ops/chol.py: a non-SPD diagonal block yields NaNs that
propagate into every later panel, so `chol_ok` detection and the
noise-inflation rescue loops keep working unchanged.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

# These single-buffer routines are safe only while the full matrix stays
# within XLA:TPU's int32 fusion addressing (<= 2^30 elements verified;
# in-place updates on bigger buffers SILENTLY corrupt — measured at
# N=51200 f32).  Past that, callers must use the column-slab storage in
# ops/slabbed.py; models/exact.py routes automatically via
# slabbed.use_slabs().


def _pallas_leaf_enabled(dtype) -> bool:
    """Fused Pallas (L, L^{-1}) leaf (ops/pallas_chol.pallas_chol_inv):
    one kernel dispatch replaces the chol+trsm custom-call pair on the
    serial leaf chain.  GP_TPU_PALLAS_LEAF=1 opts in; default OFF —
    measured on v5e (benchmarks/leaf_ab.py, round 5): the fused kernel
    LOST 1.4 ms at N=8192 / 3.5 ms at N=16384 end-to-end (Mosaic launch
    overhead per fused call exceeds the ~12 us XLA custom-call pair it
    replaces), so the stock chol+trsm leaves remain the default.  Kept
    as a correct, VJP-tested building block (tests/test_pallas_chol.py)."""
    import os

    import jax

    v = os.environ.get("GP_TPU_PALLAS_LEAF")
    if v is None:
        return False
    return (v not in ("0", "false", "")
            and (jax.default_backend() == "tpu"
                 and jnp.dtype(dtype) == jnp.float32))


def _chol_inv_block(Kb, block: int, base_block: int, base_fn,
                    need_inv: bool = True):
    """(L, T=L^-1) of one diagonal block, FUSED: the recursion's sub-block
    inverses serve both the panel GEMMs and the inverse assembly.

    Replaces the `base(Kb)` + separate `tri_inv(Ljj)` pair in
    blocked_cholesky: that pair re-solved every sub-diagonal block a
    second time (one batched triangular solve per panel) to rebuild
    inverses the recursion had already produced for its own panel GEMMs.
    Here each sub-block is solved exactly once; the strips of T are
    assembled with the same ~m^3/3 GEMM flow as tri_inv.  The serial
    non-dot chain per block drops from ~2x(m/b) to (m/b) triangular
    custom-calls.  need_inv=False (the caller's LAST panel needs no
    inverse) skips T entirely.

    At the leaf, when _pallas_leaf_enabled, the chol+trsm pair collapses
    further into ONE fused Pallas dispatch (pallas_chol_inv) — the leaf
    chain is dispatch-overhead bound (~12 us/op, BASELINE.md round-4
    residue), so halving the op count halves its serial wall.
    """
    m = Kb.shape[0]
    if m <= base_block:
        if base_fn is None and _pallas_leaf_enabled(Kb.dtype):
            from .pallas_chol import pallas_chol_inv
            L, T = pallas_chol_inv(Kb)
            return L, (T if need_inv else None)
        L = (base_fn or jnp.linalg.cholesky)(Kb)
        if not need_inv:
            return L, None
        return L, solve_triangular(L, jnp.eye(m, dtype=Kb.dtype),
                                   lower=True)
    # same split rule as blocked_cholesky's base(): quarter-size panels,
    # rounded down to a base_block multiple so the non-dividing fallback
    # below still takes blocked_cholesky's blocked path (block %
    # base_block != 0 there silently degrades to the stock full-m kernel)
    b = max(base_block, min(block, m // 4))
    b -= b % base_block
    if m % b:
        # non-dividing size: fall back to the unfused pair
        L = blocked_cholesky(Kb, block=b, base_block=base_block,
                             base_fn=base_fn)
        return L, (tri_inv(L, base=base_block) if need_inv else None)
    nb = m // b
    L = Kb
    T = jnp.zeros((m, m), Kb.dtype) if need_inv else None
    for j in range(nb):
        c0, c1 = j * b, (j + 1) * b
        last = c1 == m
        Ljj, Tjj = _chol_inv_block(L[c0:c1, c0:c1], b, base_block, base_fn,
                                   need_inv=need_inv or not last)
        L = L.at[c0:c1, c0:c1].set(jnp.tril(Ljj))
        if not last:
            pan = ut_matmul(L[c1:, c0:c1], Tjj.T)
            L = L.at[c1:, c0:c1].set(pan)
            L = L.at[c1:, c1:].add(-(pan @ pan.T))
        if need_inv:
            if c0:
                # tri_inv's strip forward-substitution, interleaved:
                # T[row, :c0] = -Tjj (L[row, :c0] @ T[:c0, :c0])
                S = lt_matmul(L[c0:c1, :c0], T[:c0, :c0])
                T = T.at[c0:c1, :c0].set(-(Tjj @ S))
            T = T.at[c0:c1, c0:c1].set(Tjj)
    return L, T


def blocked_cholesky(K, block: int = 1024, base_block: int = 128,
                     panel_inv: bool = True, zero_upper: bool = True,
                     base_fn=None, return_diag_inv: bool = False):
    """Lower Cholesky factor of K (n x n), right-looking with block panels.

    K must be FULLY symmetric (both triangles populated): the factorization
    starts from K.T to hand XLA a free layout degree of freedom (see the
    inline note below), so it READS THE UPPER TRIANGLE.  A lower-filled
    matrix with junk above the diagonal (LAPACK potrf-style input) would
    silently produce a wrong factor — every in-repo builder emits fully
    symmetric K.

    The diagonal BxB factorization recurses down to `base_block` before
    using the stock kernel.  Sizes that are not multiples of `block` fall
    back to the stock kernel (callers pad when they care).

    panel_inv=True turns the (B x B) \\ (B x n-c) panel TRSM into a GEMM
    against tri_inv(Ljj) — the B^3/3 inversion is tiny next to the
    B^2 (n-c) solve it replaces, and the GEMM runs at MXU speed where the
    many-rhs triangular solve does not.

    zero_upper=False skips the per-panel upper-strip zeroing (N^2/2 HBM
    writes): the strictly-upper part of the result then holds K leftovers.
    Safe for consumers that only read the lower triangle + diagonal —
    solve_triangular(lower=True), tri_inv / spd_inv_from_chol (strips and
    tril'd diagonal blocks), chol_logdet / chol_ok (diagonal) — i.e. the
    whole fused objective path.  Keep True for factors that are cached,
    checkpointed, or compared densely.

    base_fn overrides the BxB diagonal-block factorization (default stock
    jnp.linalg.cholesky) — e.g. the Pallas micro-panel kernel
    (ops/pallas_chol.pallas_cholesky_panel).

    return_diag_inv=True additionally returns the per-panel diagonal-block
    inverses Td (nb, block, block) the factorization computes anyway for
    its panel GEMMs (incl. the last panel's, which it would otherwise
    skip) — tri_inv_from_diag / spd_inv_from_chol reuse them instead of
    re-inverting the diagonal (one InvertDiagBlocks custom-call, 0.65 ms
    at N=8192 f32 on v5e).  Aligned sizes only (n % block == 0).
    """
    n = K.shape[0]
    if return_diag_inv:
        assert n % block == 0, "return_diag_inv requires aligned n"
    if n <= base_block or block % base_block:
        L = (base_fn or jnp.linalg.cholesky)(K)
        # stock fallback has no panel structure: callers get Td=None and
        # must fall back to tri_inv
        return (L, None) if return_diag_inv else L
    if n % block:
        # pad to blockdiag(K, I): the factor is blockdiag(L, I), slice back
        p = block - n % block
        Kp = jnp.zeros((n + p, n + p), K.dtype)
        Kp = Kp.at[:n, :n].set(K)
        Kp = Kp.at[jnp.arange(n, n + p), jnp.arange(n, n + p)].set(1.0)
        return blocked_cholesky(Kp, block, base_block, panel_inv,
                                zero_upper, base_fn)[:n, :n]

    nb = n // block
    # Cholesky input is symmetric by contract, so K.T is the same VALUE —
    # but the transpose hands XLA a free layout degree of freedom: when K
    # arrives as a row-major custom-call output (the Pallas kernel
    # builder) and layout assignment wants the factorization buffer
    # column-major, the transpose folds into a bitcast instead of a full
    # N^2 relayout copy (measured -0.8 ms per factorization at N=8192
    # f32 on v5e; BASELINE.md round 4).  With zero_upper=False the
    # strictly-upper leftovers are then K's LOWER-triangle values —
    # still "K leftovers" as documented, consumers read only the lower
    # triangle either way.
    L = K.T
    diag_invs = []
    for j in range(nb):
        c0, c1 = j * block, (j + 1) * block
        # fused diagonal factor+inverse: the recursion's sub-inverses are
        # reused instead of re-solved by a separate tri_inv(Ljj) — one
        # triangular solve per base block instead of two (see
        # _chol_inv_block; A/B'd on chip, BASELINE.md round 4)
        Ljj, Tjj = _chol_inv_block(L[c0:c1, c0:c1], block, base_block,
                                   base_fn,
                                   need_inv=return_diag_inv
                                   or (panel_inv and c1 < n))
        if return_diag_inv:
            diag_invs.append(Tjj)
        L = L.at[c0:c1, c0:c1].set(jnp.tril(Ljj))
        if c1 < n:
            if panel_inv:
                pan = ut_matmul(L[c1:, c0:c1], Tjj.T)
            else:
                pan = solve_triangular(Ljj, L[c1:, c0:c1].T, lower=True).T
            L = L.at[c1:, c0:c1].set(pan)
            L = L.at[c1:, c1:].add(-(pan @ pan.T))
            if zero_upper:
                # zero this block row's upper strip IN PLACE: a trailing
                # jnp.tril(L) materializes a second N^2 buffer (9.8 GB at
                # N=51200 f32 — measured OOM); these DUS writes alias L
                L = L.at[c0:c1, c1:].set(
                    jnp.zeros((block, n - c1), L.dtype))
    if return_diag_inv:
        return L, jnp.stack(diag_invs)
    return L


def add_diag(K, c):
    """K + c*I without materializing the N^2 eye/select: one O(N) scatter.

    `K + c * jnp.eye(n)` costs a full N^2 iota-compare-select plus a
    read+write of K (XLA cannot fuse it into a preceding custom-call K
    build); this is the O(N) in-place form.
    """
    n = K.shape[-1]
    idx = jnp.arange(n)
    return K.at[..., idx, idx].add(c)


def blocked_solve_lower(L, B, block: int = 1024):
    """Solve L W = B (L lower-triangular n x n, B n x k), forward blocked.

    The off-diagonal work is (n-c, block) x (block, k) matmuls on the MXU.
    """
    n = L.shape[0]
    vec = B.ndim == 1
    W = B[:, None] if vec else B
    if n % block:
        p = block - n % block
        Lp = jnp.zeros((n + p, n + p), L.dtype)
        Lp = Lp.at[:n, :n].set(L)
        Lp = Lp.at[jnp.arange(n, n + p), jnp.arange(n, n + p)].set(1.0)
        Wp = jnp.zeros((n + p, W.shape[1]), W.dtype).at[:n].set(W)
        out = blocked_solve_lower(Lp, Wp, block)[:n]
        return out[:, 0] if vec else out
    nb = n // block
    for j in range(nb):
        c0, c1 = j * block, (j + 1) * block
        wj = solve_triangular(L[c0:c1, c0:c1], W[c0:c1], lower=True)
        W = W.at[c0:c1].set(wj)
        if c1 < n:
            W = W.at[c1:].add(-(L[c1:, c0:c1] @ wj))
    return W[:, 0] if vec else W


def blocked_solve_lower_t(L, B, block: int = 1024):
    """Solve L^T X = B (back-substitution), blocked."""
    n = L.shape[0]
    vec = B.ndim == 1
    X = B[:, None] if vec else B
    if n % block:
        p = block - n % block
        Lp = jnp.zeros((n + p, n + p), L.dtype)
        Lp = Lp.at[:n, :n].set(L)
        Lp = Lp.at[jnp.arange(n, n + p), jnp.arange(n, n + p)].set(1.0)
        Xp = jnp.zeros((n + p, X.shape[1]), X.dtype).at[:n].set(X)
        out = blocked_solve_lower_t(Lp, Xp, block)[:n]
        return out[:, 0] if vec else out
    nb = n // block
    for j in range(nb - 1, -1, -1):
        c0, c1 = j * block, (j + 1) * block
        xj = solve_triangular(L[c0:c1, c0:c1], X[c0:c1], lower=True, trans=1)
        X = X.at[c0:c1].set(xj)
        if c0 > 0:
            X = X.at[:c0].add(-(L[c0:c1, :c0].T @ xj))
    return X[:, 0] if vec else X


def blocked_chol_solve(L, B, block: int = 1024):
    """Solve (L L^T) X = B via the two blocked sweeps."""
    return blocked_solve_lower_t(L, blocked_solve_lower(L, B, block), block)


def lt_matmul(A, T, cutoff: int = 2048):
    """A @ T for LOWER-triangular T (m x m), exploiting the zero upper
    triangle by recursive splitting:

        T = [[T11, 0], [T21, T22]]  =>  A @ T = [A1@T11 + A2@T21, A2@T22]

    The off-diagonal contribution is a dense GEMM; the diagonal blocks
    recurse until `cutoff`, below which the zeros are cheaper than another
    split.  ~k m^2 FLOPs (vs 2 k m^2 dense) at full depth; `cutoff` keeps
    every GEMM MXU-fat.
    """
    m = T.shape[0]
    if m <= cutoff:
        return A @ T
    h = m // 2
    out_l = lt_matmul(A[:, :h], T[:h, :h], cutoff) + A[:, h:] @ T[h:, :h]
    out_r = lt_matmul(A[:, h:], T[h:, h:], cutoff)
    return jnp.concatenate([out_l, out_r], axis=1)


def ut_matmul(A, U, cutoff: int = 2048):
    """A @ U for UPPER-triangular U (m x m); mirror of lt_matmul:

        U = [[U11, U12], [0, U22]]  =>  A @ U = [A1@U11, A1@U12 + A2@U22]
    """
    m = U.shape[0]
    if m <= cutoff:
        return A @ U
    h = m // 2
    out_l = ut_matmul(A[:, :h], U[:h, :h], cutoff)
    out_r = A[:, :h] @ U[:h, h:] + ut_matmul(A[:, h:], U[h:, h:], cutoff)
    return jnp.concatenate([out_l, out_r], axis=1)


def tri_inv(L, base: int = 512, cutoff: int = 2048):
    """Inverse of a lower-triangular L, MXU-blocked.

    All diagonal base-blocks invert in ONE batched (vmapped) triangular
    solve; the off-diagonal fill is strip forward-substitution — per block
    row k, one GEMM  S = L[row, :c0] @ T[:c0, :c0]  then  -Td[k] @ S —
    writing each strip into a single preallocated T (in-place under XLA
    buffer assignment).  The strip GEMM's right operand is itself lower
    triangular, so it routes through lt_matmul: ~N^3/3 total FLOPs, all on
    the MXU.  (An earlier recursive *merge* variant also hit N^3/3 but
    spent more than that moving O(N^2 log N) bytes through its per-level
    assemblies — measured 10.3 ms vs ~6 ms for the strip form at N=8192
    f32 on v5e; lt_matmul splits only the operand, keeping the strip
    writes in-place.)
    """
    n = L.shape[0]
    if n <= base:
        return solve_triangular(L, jnp.eye(n, dtype=L.dtype), lower=True)
    if n % base:
        # pad to blockdiag(L, I); its inverse is blockdiag(L^-1, I)
        p = base - n % base
        Lp = jnp.zeros((n + p, n + p), L.dtype)
        Lp = Lp.at[:n, :n].set(L)
        Lp = Lp.at[jnp.arange(n, n + p), jnp.arange(n, n + p)].set(1.0)
        return tri_inv(Lp, base)[:n, :n]

    import jax

    nb = n // base
    # static-slice stack: a reshape(nb,b,nb,b)+gather materializes TWO full
    # N^2 intermediates (~1.6 ms at N=8192 f32 on v5e); slicing the nb
    # diagonal blocks directly moves only nb*b^2 bytes
    dblocks = jnp.stack([L[k * base:(k + 1) * base, k * base:(k + 1) * base]
                         for k in range(nb)])                 # (nb, b, b)
    eye = jnp.eye(base, dtype=L.dtype)
    Td = jax.vmap(
        lambda Lb: solve_triangular(Lb, eye, lower=True))(dblocks)

    T = jnp.zeros((n, n), L.dtype).at[:base, :base].set(Td[0])
    for k in range(1, nb):
        c0, c1 = k * base, (k + 1) * base
        S = lt_matmul(L[c0:c1, :c0], T[:c0, :c0], cutoff)  # (b, c0) GEMM
        T = T.at[c0:c1, :c0].set(-(Td[k] @ S))
        T = T.at[c0:c1, c0:c1].set(Td[k])
    return T


def tri_inv_from_diag(L, Td, block: int, cutoff: int = 2048):
    """L^{-1} given the per-panel diagonal-block inverses Td
    (nb, block, block) that blocked_cholesky(return_diag_inv=True)
    computed anyway — tri_inv's strip forward-substitution with its
    batched diagonal inversion (an InvertDiagBlocks custom-call, 0.65 ms
    at N=8192 f32 on v5e) deleted, and fewer/wider strips (the panel
    width, not tri_inv's smaller base)."""
    n = L.shape[0]
    nb = n // block
    assert nb * block == n and Td.shape == (nb, block, block)
    T = jnp.zeros((n, n), L.dtype).at[:block, :block].set(Td[0])
    for k in range(1, nb):
        c0, c1 = k * block, (k + 1) * block
        S = lt_matmul(L[c0:c1, :c0], T[:c0, :c0], cutoff)
        T = T.at[c0:c1, :c0].set(-(Td[k] @ S))
        T = T.at[c0:c1, c0:c1].set(Td[k])
    return T


def spd_inv_from_chol(L, block: int = 1024, base: int = 512,
                      diag_inv=None):
    """K^-1 from K = L L^T as T^T T with T = L^-1 (GEMM-rich dpotri analog).

    lauum-style symmetric product: K^-1 is symmetric, so only its block
    lower triangle is computed — row strip i is one
    (b x n-c0) @ (n-c0 x c0) GEMM (T's rows above c0 in those columns are
    zero) plus a (b x b) diagonal SYRK — then mirrored by writing each
    strip and its transpose.  ~N^3/3 GEMM FLOPs, versus ~N^3 for the
    full-column sweep it replaces.  Replaces `chol_solve(L, I)` (two
    latency-bound triangular sweeps with N right-hand sides) in the
    analytic-gradient path (GP.cpp:154: `inverse()`).

    diag_inv: per-panel diagonal-block inverses from
    blocked_cholesky(return_diag_inv=True) — skips tri_inv's diagonal
    re-inversion (see tri_inv_from_diag).  Aligned n only.
    """
    n = L.shape[0]
    if n < block:
        T = tri_inv(L, base)
        return T.T @ T
    if n % block:
        # blockdiag(L, I): its K^-1 is blockdiag(K^-1, I) — slice back
        p = block - n % block
        Lp = jnp.zeros((n + p, n + p), L.dtype)
        Lp = Lp.at[:n, :n].set(L)
        Lp = Lp.at[jnp.arange(n, n + p), jnp.arange(n, n + p)].set(1.0)
        return spd_inv_from_chol(Lp, block, base)[:n, :n]
    T = (tri_inv_from_diag(L, diag_inv, block) if diag_inv is not None
         else tri_inv(L, base))
    nb = n // block
    A = jnp.zeros((n, n), L.dtype)
    for i in range(nb):
        c0, c1 = i * block, (i + 1) * block
        R = T[c0:, c0:c1]                      # (n-c0, b)
        if c0:
            S = R.T @ T[c0:, :c0]              # strictly-lower strip
            A = A.at[c0:c1, :c0].set(S)
            A = A.at[:c0, c0:c1].set(S.T)
        A = A.at[c0:c1, c0:c1].set(R.T @ R)    # symmetric diagonal block
    return A
