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

Scope (round 4): factorization + logdet + forward/back solves + the
fused distributed NLL *value* (pnll2d).  The analytic gradient keeps the
1-D layout (pgp.pnll_vg) — its W-build/SYRK streaming is specific to
row-sharded storage; the 2-D gradient is the recorded next step.

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

from ..models.base import hyp_mean, hyp_sn2, sanitize_value_and_grad
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


def pchol2d_local(K_loc, pr: int, pc: int):
    """Right-looking blocked Cholesky on the 2-D block-cyclic layout.

    K_loc: (nbr, nbc, B, B) — this device's blocks.  Returns L in the
    same layout: diagonal blocks tril'd, above-diagonal blocks untouched
    (consumers read the block lower triangle only, mirroring the 1-D
    zero-upper-free contract).
    """
    nbr, nbc, B = K_loc.shape[0], K_loc.shape[1], K_loc.shape[2]
    nb = nbr * pr
    r, c, gi, gj = _grid_ids(nbr, nbc, pr, pc)

    for k in range(nb):                                  # static unroll
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

        # 5. trailing update on the static conservative corner: boundary
        #    blocks with global index <= k are exact zeros in prow/pcol
        li0, lj0 = (k + 1) // pr, (k + 1) // pc
        if li0 < nbr and lj0 < nbc:
            upd = jnp.einsum("iak,jbk->ijab", prow[li0:], pcol[lj0:])
            K_loc = K_loc.at[li0:, lj0:].add(-upd)
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
    """Solve L w = rhs with rhs (N,) REPLICATED; returns w replicated.

    Row k of L is spread over grid row k%Pr: each panel costs two O(B)
    psums — O(N B) comm per solve, negligible next to the factorization.
    """
    nbr, nbc, B = L_loc.shape[0], L_loc.shape[1], L_loc.shape[2]
    nb = nbr * pr
    r, c, gi, gj = _grid_ids(nbr, nbc, pr, pc)
    w = jnp.zeros_like(rhs)
    for k in range(nb):
        orow, oc = k % pr, k % pc
        li, lj = k // pr, k // pc
        wj = w.reshape(nb, B)[gj]                        # (nbc, B)
        Lrow = jnp.where(((gj < k) & (r == orow))[:, None, None],
                         L_loc[li], 0.0)
        part = jnp.einsum("jab,jb->a", Lrow, wj)         # (B,)
        part = jax.lax.psum(jax.lax.psum(part, AXC), AXR)
        Lkk = _replicate_from(L_loc[li, lj], orow, oc, r, c)
        wk = solve_triangular(jnp.tril(Lkk),
                              rhs.reshape(nb, B)[k] - part, lower=True)
        w = w.reshape(nb, B).at[k].set(wk).reshape(-1)
    return w


def psolve2d_lower_t_local(L_loc, rhs, pr: int, pc: int):
    """Solve L^T x = rhs (back-substitution), rhs (N,) replicated.

    Column k of L is spread over grid column k%Pc (rows i%Pr)."""
    nbr, nbc, B = L_loc.shape[0], L_loc.shape[1], L_loc.shape[2]
    nb = nbr * pr
    r, c, gi, gj = _grid_ids(nbr, nbc, pr, pc)
    x = jnp.zeros_like(rhs)
    for k in range(nb - 1, -1, -1):
        orow, oc = k % pr, k % pc
        li, lj = k // pr, k // pc
        xi = x.reshape(nb, B)[gi]                        # (nbr, B)
        Lcol = jnp.where(((gi > k) & (c == oc))[:, None, None],
                         L_loc[:, lj], 0.0)
        part = jnp.einsum("iab,ia->b", Lcol, xi)         # (B,)
        part = jax.lax.psum(jax.lax.psum(part, AXR), AXC)
        Lkk = _replicate_from(L_loc[li, lj], orow, oc, r, c)
        xk = solve_triangular(jnp.tril(Lkk),
                              rhs.reshape(nb, B)[k] - part,
                              lower=True, trans=1)
        x = x.reshape(nb, B).at[k].set(xk).reshape(-1)
    return x


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
