"""Distributed blocked Cholesky / solves vs dense references (8-dev CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from functools import partial
from jax.sharding import PartitionSpec as P
from jax import shard_map

from gp_tpu.parallel.mesh import make_mesh
from gp_tpu.parallel import pchol


NDEV = 8


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(NDEV, axis_name="rows")


def _spd(n, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n))
    return A @ A.T + n * np.eye(n)


def _shard_rows(mesh, fn, n_out=1):
    spec = P(None, "rows")
    out = spec if n_out == 1 else tuple([spec] * n_out)
    return shard_map(fn, mesh=mesh, in_specs=spec, out_specs=out)


def test_pchol_matches_dense(mesh):
    n, B = 64, 4
    K = _spd(n)
    Kb = pchol.blocked_layout(jnp.asarray(K), NDEV, B)

    fn = _shard_rows(mesh, lambda kl: pchol.pchol_local(
        kl.squeeze(1), NDEV, "rows")[:, None])
    Lb = jax.jit(fn)(Kb)
    L = pchol.unblocked_layout(np.asarray(Lb))
    L_ref = np.linalg.cholesky(K)
    np.testing.assert_allclose(L, L_ref, rtol=1e-10, atol=1e-10)


def test_pchol_logdet(mesh):
    n, B = 32, 4
    K = _spd(n, 1)
    Kb = pchol.blocked_layout(jnp.asarray(K), NDEV, B)

    def body(kl):
        L = pchol.pchol_local(kl.squeeze(1), NDEV, "rows")
        return pchol.plogdet_local(L, NDEV, "rows")

    ld = jax.jit(shard_map(body, mesh=mesh, in_specs=P(None, "rows"),
                           out_specs=P()))(Kb)
    _, ld_ref = np.linalg.slogdet(K)
    np.testing.assert_allclose(float(ld), ld_ref, rtol=1e-10)


def test_ptrsm_and_chol_solve(mesh):
    n, B, t = 64, 8, 5
    K = _spd(n, 2)
    rng = np.random.default_rng(3)
    R = rng.standard_normal((n, t))
    Kb = pchol.blocked_layout(jnp.asarray(K), NDEV, B)
    Rb = pchol.blocked_layout(jnp.asarray(R), NDEV, B)

    def body(kl, rl):
        L = pchol.pchol_local(kl.squeeze(1), NDEV, "rows")
        rl = rl.squeeze(1)
        W = pchol.ptrsm_lower_local(L, rl, NDEV, "rows")
        X = pchol.ptrsm_lowerT_local(L, W, NDEV, "rows")
        Y = pchol.pchol_solve_local(L, rl, NDEV, "rows")
        return W[:, None], X[:, None], Y[:, None]

    fn = shard_map(body, mesh=mesh,
                   in_specs=(P(None, "rows"), P(None, "rows")),
                   out_specs=(P(None, "rows"),) * 3)
    Wb, Xb, Yb = jax.jit(fn)(Kb, Rb)
    W = pchol.unblocked_layout(np.asarray(Wb))
    X = pchol.unblocked_layout(np.asarray(Xb))
    Y = pchol.unblocked_layout(np.asarray(Yb))

    L_ref = np.linalg.cholesky(K)
    import scipy.linalg as sla
    W_ref = sla.solve_triangular(L_ref, R, lower=True)
    np.testing.assert_allclose(W, W_ref, rtol=1e-9, atol=1e-9)
    X_ref = np.linalg.solve(K, R)
    np.testing.assert_allclose(X, X_ref, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(Y, X_ref, rtol=1e-8, atol=1e-8)


def test_pinv_from_chol(mesh):
    n, B = 32, 4
    K = _spd(n, 4)
    Kb = pchol.blocked_layout(jnp.asarray(K), NDEV, B)

    def body(kl):
        L = pchol.pchol_local(kl.squeeze(1), NDEV, "rows")
        return pchol.pinv_from_chol_local(L, NDEV, "rows")[:, None]

    Zb = jax.jit(shard_map(body, mesh=mesh, in_specs=P(None, "rows"),
                           out_specs=P(None, "rows")))(Kb)
    Z = pchol.unblocked_layout(np.asarray(Zb))
    np.testing.assert_allclose(Z, np.linalg.inv(K), rtol=1e-8, atol=1e-9)


def test_pchol_nonspd_produces_nan(mesh):
    n, B = 32, 4
    K = _spd(n, 5)
    K = K - 2 * n * np.eye(n)          # indefinite
    assert np.min(np.linalg.eigvalsh(K)) < 0
    Kb = pchol.blocked_layout(jnp.asarray(K), NDEV, B)
    fn = _shard_rows(mesh, lambda kl: pchol.pchol_local(
        kl.squeeze(1), NDEV, "rows")[:, None])
    Lb = np.asarray(jax.jit(fn)(Kb))
    assert not np.all(np.isfinite(Lb))


def test_pkinv_rowblock_streamed(mesh):
    """The streamed K^-1 row-block generator (sliced SYRK + psum_scatter)
    agrees with the materializing pinv_from_chol_local block for block."""
    n, B = 64, 4
    K = _spd(n, 6)
    Kb = pchol.blocked_layout(jnp.asarray(K), NDEV, B)
    nbl = n // (NDEV * B)

    def body(kl):
        L = pchol.pchol_local(kl.squeeze(1), NDEV, "rows")
        g = pchol._local_blocks(nbl, NDEV, "rows")
        row_ids = g[:, None] * B + jnp.arange(B)[None, :]
        eye_rows = (row_ids[:, :, None] == jnp.arange(n)[None, None, :]
                    ).astype(L.dtype)
        W = pchol.ptrsm_lower_local(L, eye_rows, NDEV, "rows")
        blocks = [pchol.pkinv_rowblock_local(W, l, NDEV, "rows")
                  for l in range(nbl)]
        return jnp.stack(blocks)[:, None]          # (nbl, 1, B, n)

    Zb = jax.jit(shard_map(body, mesh=mesh, in_specs=P(None, "rows"),
                           out_specs=P(None, "rows")))(Kb)
    Z = pchol.unblocked_layout(np.asarray(Zb))     # natural row order
    np.testing.assert_allclose(Z, np.linalg.inv(K), rtol=1e-8, atol=1e-9)


def test_int32_shard_guard_bounds():
    """check_shard_addressable trips exactly past 2^30 elements/device
    (the proven XLA:TPU in-place corruption wall, ops/slabbed.py)."""
    # 92672^2 / 8 = 1.0735e9 <= 2^30*... compute exact: ok below, raise above
    ok_n = int((float(1 << 30) * 8) ** 0.5) // 256 * 256          # 92416
    assert ok_n * ok_n // 8 <= (1 << 30)
    pchol.check_shard_addressable(ok_n, 8)         # must not raise
    bad_n = ok_n + 2048
    assert bad_n * bad_n // 8 > (1 << 30)
    with pytest.raises(ValueError, match="int32-safe"):
        pchol.check_shard_addressable(bad_n, 8)
    # the error message suggests a workable device count
    try:
        pchol.check_shard_addressable(bad_n, 8)
    except ValueError as e:
        import re
        need = int(re.search(r"use >= (\d+) devices", str(e)).group(1))
        assert bad_n * bad_n // need <= (1 << 30)


def test_int32_guard_wired_into_wrappers(mesh, monkeypatch):
    """Every distributed entry point routes through the guard: with the
    safe bound lowered, a small pnll_vg call must refuse loudly instead
    of silently corrupting (the failure mode measured on real TPU)."""
    from gp_tpu.ops.kernels import get_kernel
    from gp_tpu.parallel import pchol as pchol_mod, pgp

    rng = np.random.default_rng(0)
    n, d = 64, 3
    X = rng.standard_normal((n, d))
    y = rng.standard_normal(n)
    from gp_tpu.models.base import default_hyps
    hyp = default_hyps(get_kernel("se_ard"), X, y, 1e-3, False)
    monkeypatch.setattr(pchol_mod, "MAX_SLAB_ELEMS", 64)
    with pytest.raises(ValueError, match="int32-safe"):
        pgp.pnll_vg(get_kernel("se_ard"), hyp, X, y, mesh, block=4)


def test_pchol_lookahead_bitwise_matches_sequential(mesh):
    """The one-panel lookahead pipeline applies the SAME contraction in
    two disjoint column slices — the factor must be BITWISE equal to the
    sequential schedule's (and both match LAPACK)."""
    n, B = 128, 4
    K = _spd(n, 7)
    Kb = pchol.blocked_layout(jnp.asarray(K), NDEV, B)

    def run(look):
        fn = _shard_rows(mesh, lambda kl: pchol.pchol_local(
            kl.squeeze(1), NDEV, "rows", lookahead=look)[:, None])
        return np.asarray(jax.jit(fn)(Kb))

    La, Lb_ = run(True), run(False)
    assert np.array_equal(La, Lb_), "lookahead changed the factor bits"
    L = pchol.unblocked_layout(La)
    np.testing.assert_allclose(L, np.linalg.cholesky(K),
                               rtol=1e-10, atol=1e-10)


def test_pinv_rows_matches_generic_trsm(mesh):
    """The triangular-structure-specialized W = L^{-1} build must match
    the generic identity-RHS ptrsm (and the dense inverse)."""
    n, B = 64, 4
    K = _spd(n, 11)
    Kb = pchol.blocked_layout(jnp.asarray(K), NDEV, B)

    def body(kl):
        L = pchol.pchol_local(kl.squeeze(1), NDEV, "rows")
        g = pchol._local_blocks(kl.shape[0], NDEV, "rows")
        rid = g[:, None] * B + jnp.arange(B)[None, :]
        eye_rows = (rid[:, :, None] == jnp.arange(n)[None, None, :]
                    ).astype(kl.dtype)
        W_ref = pchol.ptrsm_lower_local(L, eye_rows, NDEV, "rows")
        W = pchol.pinv_rows_local(L, NDEV, "rows")
        return W[:, None], W_ref[:, None]

    fn = shard_map(body, mesh=mesh, in_specs=P(None, "rows"),
                   out_specs=(P(None, "rows"), P(None, "rows")))
    W, W_ref = jax.jit(fn)(Kb)
    np.testing.assert_allclose(np.asarray(W), np.asarray(W_ref),
                               rtol=1e-12, atol=1e-12)
    Wd = pchol.unblocked_layout(np.asarray(W))
    L_ref = np.linalg.cholesky(K)
    np.testing.assert_allclose(Wd, np.linalg.inv(L_ref),
                               rtol=1e-9, atol=1e-9)
