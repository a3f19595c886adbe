"""2-D block-cyclic distributed Cholesky (parallel/pchol2d.py): factor /
logdet / solve parity vs LAPACK and the fused NLL vs the single-device
objective, on 2x4 and 4x2 virtual grids."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from gp_tpu.parallel import pchol2d

shard_map = jax.shard_map

PR, PC = 2, 4


def _mesh(pr=PR, pc=PC):
    devs = np.asarray(jax.devices("cpu")[:pr * pc]).reshape(pr, pc)
    return Mesh(devs, (pchol2d.AXR, pchol2d.AXC))


def _spd(n, seed):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n))
    return A @ A.T + n * np.eye(n)


@pytest.mark.parametrize("pr,pc", [(2, 4), (4, 2)])
def test_pchol2d_matches_lapack(pr, pc):
    n, B = 64, 8
    K = _spd(n, 3)
    Kb = pchol2d.blocked_layout_2d(jnp.asarray(K), pr, pc, B)
    mesh = _mesh(pr, pc)
    fn = shard_map(lambda kl: pchol2d.pchol2d_local(kl[0, 0], pr, pc)[None, None],
                   mesh=mesh,
                   in_specs=P(pchol2d.AXR, pchol2d.AXC),
                   out_specs=P(pchol2d.AXR, pchol2d.AXC))
    Lb = jax.jit(fn)(Kb)
    L = np.tril(pchol2d.unblocked_layout_2d(Lb))
    np.testing.assert_allclose(L, np.linalg.cholesky(K),
                               rtol=1e-10, atol=1e-10)


def test_pchol2d_logdet_and_solves():
    n, B = 64, 8
    K = _spd(n, 5)
    rhs = np.random.default_rng(7).standard_normal(n)
    Kb = pchol2d.blocked_layout_2d(jnp.asarray(K), PR, PC, B)
    mesh = _mesh()

    def body(kl, r):
        L = pchol2d.pchol2d_local(kl[0, 0], PR, PC)
        ld = pchol2d.plogdet2d_local(L, PR, PC)
        w = pchol2d.psolve2d_lower_local(L, r, PR, PC)
        x = pchol2d.psolve2d_lower_t_local(L, w, PR, PC)
        return ld, w, x

    fn = shard_map(body, mesh=mesh,
                   in_specs=(P(pchol2d.AXR, pchol2d.AXC), P()),
                   out_specs=(P(), P(), P()), check_vma=False)
    ld, w, x = jax.jit(fn)(Kb, jnp.asarray(rhs))
    Lr = np.linalg.cholesky(K)
    np.testing.assert_allclose(float(ld), 2 * np.sum(np.log(np.diag(Lr))),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(w),
                               np.linalg.solve(Lr, rhs), rtol=1e-9,
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(x),
                               np.linalg.solve(K, rhs), rtol=1e-8,
                               atol=1e-9)


def test_pnll2d_matches_single_device():
    """Fused 2-D NLL == the single-device objective (padded rows included)."""
    from gp_tpu.models import exact
    from gp_tpu.models.base import default_hyps
    from gp_tpu.ops.kernels import get_kernel

    SE = get_kernel("se_ard")
    rng = np.random.default_rng(0)
    n, d = 100, 3                        # pads to the lcm block multiple
    X = rng.uniform(-2, 2, (n, d))
    y = np.sin(X[:, 0]) + 0.1 * rng.standard_normal(n)
    hyp = jnp.asarray(default_hyps(SE, X, y, 1e-3, False))
    mesh = _mesh()
    f2d = pchol2d.pnll2d(SE, hyp, X, y, mesh, block=4)
    f1 = exact.nll(SE, hyp, jnp.asarray(X), jnp.asarray(y))
    np.testing.assert_allclose(float(f2d), float(f1), rtol=1e-10)


def test_pnll2d_inf_on_non_spd():
    """A hyp vector driving K indefinite must sanitize to INF, matching
    the 1-D and single-device INF-objective semantics (GP.cpp:147-148)."""
    from gp_tpu.config import INF
    from gp_tpu.models.base import default_hyps
    from gp_tpu.ops.kernels import get_kernel

    SE = get_kernel("se_ard")
    rng = np.random.default_rng(2)
    X = rng.uniform(-2, 2, (64, 2))
    y = rng.standard_normal(64)
    hyp = np.asarray(default_hyps(SE, X, y, 1e-3, False))
    hyp[-2] = np.log(1e-300)             # sn2 = 0: K loses strict PD in f64
    hyp[0] = hyp[1] = 10.0               # huge length scales: K ~ rank-1
    f = pchol2d.pnll2d(SE, jnp.asarray(hyp), X, y, _mesh(), block=4)
    assert float(f) == INF


def test_pinv2d_and_pkinv2d_match_numpy():
    """W = L^-1 and the SUMMA K^-1 tiles on the grid vs dense numpy."""
    n, B = 64, 8
    K = _spd(n, 9)
    Kb = pchol2d.blocked_layout_2d(jnp.asarray(K), PR, PC, B)
    mesh = _mesh()

    def body(kl):
        L = pchol2d.pchol2d_local(kl[0, 0], PR, PC)
        W = pchol2d.pinv2d_local(L, PR, PC)
        Ki = pchol2d.pkinv2d_local(W, PR, PC)
        return W[None, None], Ki[None, None]

    fn = shard_map(body, mesh=mesh,
                   in_specs=P(pchol2d.AXR, pchol2d.AXC),
                   out_specs=(P(pchol2d.AXR, pchol2d.AXC),
                              P(pchol2d.AXR, pchol2d.AXC)),
                   check_vma=False)
    Wb, Kib = jax.jit(fn)(Kb)
    W = pchol2d.unblocked_layout_2d(Wb)
    Ki = pchol2d.unblocked_layout_2d(Kib)
    Lr = np.linalg.cholesky(K)
    np.testing.assert_allclose(W, np.linalg.inv(Lr), rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(Ki, np.linalg.inv(K), rtol=1e-8, atol=1e-9)


def test_pnll_vg2d_matches_single_device_and_1d():
    """The grid (NLL, grad) == the single-device objective AND the 1-D
    distributed gradient (pgp.pnll_vg), padded rows included."""
    from gp_tpu.models import exact
    from gp_tpu.models.base import default_hyps
    from gp_tpu.ops.kernels import get_kernel
    from gp_tpu.parallel import pgp
    from gp_tpu.parallel.mesh import make_mesh

    SE = get_kernel("se_ard")
    rng = np.random.default_rng(4)
    n, d = 100, 3
    X = rng.uniform(-2, 2, (n, d))
    y = np.sin(X[:, 0]) + 0.1 * rng.standard_normal(n)
    hyp = jnp.asarray(default_hyps(SE, X, y, 1e-3, False))
    hyp = hyp.at[-2].set(np.log(0.1))

    f2, g2 = pchol2d.pnll_vg2d(SE, hyp, X, y, _mesh(), block=4)
    f0, g0 = exact.nll_vg_raw(SE, hyp, jnp.asarray(X), jnp.asarray(y))
    np.testing.assert_allclose(float(f2), float(f0), rtol=1e-11)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g0),
                               rtol=1e-8, atol=1e-10)

    mesh1 = make_mesh(8, axis_name="rows")
    f1, g1 = pgp.pnll_vg(SE, hyp, X, y, mesh1, block=4)
    np.testing.assert_allclose(float(f2), float(f1), rtol=1e-11)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                               rtol=1e-8, atol=1e-10)


def test_pfit2d_hosted_matches_single_device_fit():
    """The hosted 2-D fit reaches the single-device optimizer's basin."""
    from gp_tpu.models import exact
    from gp_tpu.models.base import default_hyps, hyp_range, to_opt_vec
    from gp_tpu.ops.kernels import get_kernel

    SE = get_kernel("se_ard")
    rng = np.random.default_rng(6)
    n, d = 96, 2
    X = rng.uniform(-2, 2, (n, d))
    y = np.sin(2 * X[:, 0]) * np.cos(X[:, 1]) + 0.05 * rng.standard_normal(n)
    hyp0 = jnp.asarray(default_hyps(SE, X, y, 1e-3, False))
    lb, ub = hyp_range(SE, X, y, noise_lb=1e-3)
    lb_v = jnp.asarray(to_opt_vec(jnp.asarray(lb), False))
    ub_v = jnp.asarray(to_opt_vec(jnp.asarray(ub), False))
    vec0 = jnp.clip(jnp.asarray(to_opt_vec(hyp0, False)), lb_v, ub_v)

    res2 = pchol2d.pfit2d_hosted(SE, False, X, y, vec0, lb_v, ub_v,
                                 _mesh(), block=4, max_evals=60)
    res1 = exact.fit(SE, False, jnp.asarray(X), jnp.asarray(y), vec0,
                     lb_v, ub_v, max_evals=60)
    # optimizer paths diverge on rounding within a 60-eval budget (three
    # drivers, three stopping points observed) — demand basin-level
    # quality, not a path pin: the 2-D fit must improve materially from
    # the start and land at least as low as the jitted single-device fit
    # (within a small band).  Evaluation-level parity is pinned
    # separately by test_pnll_vg2d_matches_single_device_and_1d.
    f0, _ = pchol2d.pnll_vg2d(SE, hyp0, X, y, _mesh(), block=4)
    assert np.isfinite(float(res2.f))
    assert float(res2.f) < float(f0) - 5.0, "no material improvement"
    assert float(res2.f) <= float(res1.f) + 0.5

    # SAME-DRIVER short-trajectory pin (round 5: tightens the loose-band
    # weakness) — the identical hosted L-BFGS-B over the grid vs the 1-D
    # objective, stopped before optimizer chaos can amplify the 1e-11
    # per-evaluation differences (measured: at 60 evals the two runs
    # legitimately diverge to different nearby optima — the GRID run
    # landing LOWER — purely from accept/reject threshold sensitivity;
    # at a 15-eval budget the trajectories must still be locked).
    from gp_tpu.optim.lbfgsb import lbfgsb_hosted
    from gp_tpu.parallel import pgp
    from gp_tpu.parallel.mesh import make_mesh
    from gp_tpu.models.base import from_opt_vec, sanitize_value_and_grad

    mesh1 = make_mesh(8, axis_name="rows")

    def fun_2d(v):
        hyp = from_opt_vec(v, False)
        return pchol2d.pnll_vg2d(SE, hyp, X, y, _mesh(), block=4)

    def fun_1d(v):
        hyp = from_opt_vec(v, False)
        f, g = pgp.pnll_vg(SE, hyp, X, y, mesh1, block=4)
        return sanitize_value_and_grad(f, g)

    r2s = lbfgsb_hosted(fun_2d, vec0, lb_v, ub_v, max_evals=15,
                        jit_fun=False)
    r1s = lbfgsb_hosted(fun_1d, vec0, lb_v, ub_v, max_evals=15,
                        jit_fun=False)
    # measured residual at 15 evals: 1.3e-7 relative (the 1e-11
    # evaluation gap amplified through ~7 line searches)
    np.testing.assert_allclose(float(r2s.f), float(r1s.f), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(r2s.x), np.asarray(r1s.x),
                               rtol=1e-4, atol=1e-6)


def test_train_distributed_routes_grid_mesh():
    """GP.train_distributed on a ("rowg", "colg") mesh fits, caches the
    posterior, and SERVES entirely on the grid (round 5: no 1-D
    fallback) — same basin and predictions as the 1-D route."""
    from gp_tpu import GP
    from gp_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(12)
    n, d = 96, 2
    X = rng.uniform(-2, 2, (n, d))
    y = np.sin(2 * X[:, 0]) + 0.05 * rng.standard_normal(n)
    Xs = rng.uniform(-2, 2, (12, d))

    a = GP(X, y)
    nll_a = a.train_distributed(make_mesh(8, axis_name="rows"), block=4)
    b = GP(X, y)
    nll_b = b.train_distributed(_mesh(), block=4)
    np.testing.assert_allclose(nll_b, nll_a, rtol=1e-5)
    # the cached posterior IS the grid layout, not a flattened 1-D one
    mesh_b = b._post_dist[0]
    assert {"rowg", "colg"} <= set(mesh_b.axis_names)
    assert b._post_dist[2].ndim == 6                     # (Pr,Pc,nbr,nbc,B,B)
    mu_a, s2_a = a.batch_predict(Xs)
    mu_b, s2_b = b.batch_predict(Xs)
    np.testing.assert_allclose(mu_b, mu_a, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(s2_b, s2_a, rtol=1e-4, atol=1e-8)


@pytest.mark.parametrize("pr,pc", [(2, 4), (4, 2)])
def test_pchol2d_lookahead_bitwise(pr, pc):
    """The one-panel lookahead pipeline must produce a bitwise-identical
    factor to the sequential schedule (same contraction per output
    element, split into two disjoint column slices) — mirror of
    test_pchol.py's 1-D lookahead pin."""
    n, B = 64, 8
    K = _spd(n, 11)
    Kb = pchol2d.blocked_layout_2d(jnp.asarray(K), pr, pc, B)
    mesh = _mesh(pr, pc)

    def run(la):
        fn = shard_map(
            lambda kl: pchol2d.pchol2d_local(kl[0, 0], pr, pc,
                                             lookahead=la)[None, None],
            mesh=mesh, in_specs=P(pchol2d.AXR, pchol2d.AXC),
            out_specs=P(pchol2d.AXR, pchol2d.AXC))
        return np.asarray(jax.jit(fn)(Kb))

    np.testing.assert_array_equal(run(True), run(False))


def test_psolve2d_multi_rhs():
    """The grid solves accept (N, T) right-hand sides (the serving path's
    variance batch) and match dense numpy."""
    n, B, T = 64, 8, 5
    K = _spd(n, 13)
    rhs = np.random.default_rng(17).standard_normal((n, T))
    Kb = pchol2d.blocked_layout_2d(jnp.asarray(K), PR, PC, B)
    mesh = _mesh()

    def body(kl, r):
        L = pchol2d.pchol2d_local(kl[0, 0], PR, PC)
        w = pchol2d.psolve2d_lower_local(L, r, PR, PC)
        x = pchol2d.psolve2d_lower_t_local(L, w, PR, PC)
        return w, x

    fn = shard_map(body, mesh=mesh,
                   in_specs=(P(pchol2d.AXR, pchol2d.AXC), P()),
                   out_specs=(P(), P()), check_vma=False)
    w, x = jax.jit(fn)(Kb, jnp.asarray(rhs))
    Lr = np.linalg.cholesky(K)
    np.testing.assert_allclose(np.asarray(w), np.linalg.solve(Lr, rhs),
                               rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(K, rhs),
                               rtol=1e-8, atol=1e-9)


def test_pset_k2d_and_ppredict2d_match_single_device():
    """Grid posterior cache + serving (pset_k2d / ppredict2d /
    ppredict2d_with_grad) vs the single-device posterior — GP::_setK +
    GP::_predict (GP.cpp:423-444, 273-297) entirely on the grid."""
    from gp_tpu.models import exact
    from gp_tpu.models.base import default_hyps
    from gp_tpu.ops.kernels import get_kernel
    from gp_tpu.parallel import pgp
    from gp_tpu.parallel.mesh import make_mesh

    SE = get_kernel("se_ard")
    rng = np.random.default_rng(21)
    n, d = 100, 3
    X = rng.uniform(-2, 2, (n, d))
    y = np.sin(X[:, 0]) + 0.1 * rng.standard_normal(n)
    Xs = rng.uniform(-2, 2, (12, d))
    hyp = jnp.asarray(default_hyps(SE, X, y, 1e-3, False))
    hyp = hyp.at[-2].set(np.log(0.1))
    mesh = _mesh()

    h2, L2, inv2, ok = pchol2d.pset_k2d(SE, hyp, X, y, mesh, block=4)
    assert ok
    mu2, s22 = pchol2d.ppredict2d(SE, h2, X, L2, inv2, Xs, mesh, block=4)
    h1, f1, inv1, _ = exact.set_k(SE, hyp, jnp.asarray(X), jnp.asarray(y))
    mu1, s21 = exact.predict(SE, h1, jnp.asarray(X), f1, inv1,
                             jnp.asarray(Xs))
    np.testing.assert_allclose(np.asarray(mu2), np.asarray(mu1),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(s22), np.asarray(s21),
                               rtol=1e-8, atol=1e-10)

    # acquisition-path gradients vs the 1-D distributed twin
    y2, gy2, s2g2, gs22 = pchol2d.ppredict2d_with_grad(
        SE, h2, X, L2, inv2, Xs, mesh, block=4)
    mesh1 = make_mesh(8, axis_name="rows")
    h1d, L1d, inv1d, _ = pgp.pset_k(SE, hyp, X, y, mesh1, block=4)
    y1, gy1, s2g1, gs21 = pgp.ppredict_with_grad(
        SE, h1d, X, L1d, inv1d, Xs, mesh1, block=4)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(gy2), np.asarray(gy1),
                               rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(s2g2), np.asarray(s2g1),
                               rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(gs22), np.asarray(gs21),
                               rtol=1e-6, atol=1e-9)


def test_pset_k2d_noise_inflation_rescue():
    """A near-singular K (tiny noise, huge length scales) must recover
    through the grid noise-inflation ladder — every attempt a grid
    program, no 1-D re-entry (GP.cpp:423-444 semantics)."""
    from gp_tpu.models.base import default_hyps
    from gp_tpu.ops.kernels import get_kernel

    SE = get_kernel("se_ard")
    rng = np.random.default_rng(2)
    X = rng.uniform(-2, 2, (64, 2))
    y = rng.standard_normal(64)
    hyp = np.array(default_hyps(SE, X, y, 1e-3, False))
    hyp[-2] = np.log(1e-14)
    hyp[0] = hyp[1] = 10.0                   # K ~ rank-1: chol fails in f64
    h, L, inv, ok = pchol2d.pset_k2d(SE, jnp.asarray(hyp), X, y, _mesh(),
                                     block=4)
    assert ok
    assert float(h[-2]) > np.log(1e-14)      # noise was inflated
    assert np.all(np.isfinite(np.asarray(inv)))


@pytest.mark.parametrize("pr,pc", [(2, 4), (4, 2)])
def test_grid_roundtrip_train_predict_save_load(tmp_path, pr, pc):
    """The VERDICT round-5 'done' criterion: a grid-mesh train -> predict
    -> save -> load -> restore -> predict round trip agreeing with the
    1-D route to 1e-8, with the posterior staying on the grid
    throughout."""
    from gp_tpu import GP
    from gp_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(31)
    n, d = 96, 2
    X = rng.uniform(-2, 2, (n, d))
    y = np.sin(2 * X[:, 0]) + 0.05 * rng.standard_normal(n)
    Xs = rng.uniform(-2, 2, (10, d))
    mesh = _mesh(pr, pc)

    m = GP(X, y)
    m.train_distributed(mesh, block=4)
    mu, s2 = m.batch_predict(Xs)

    # 1-D route at the SAME hyperparameters: grid serving must agree to
    # 1e-8 (independently-trained routes differ by optimizer rounding —
    # basin-level agreement is pinned in
    # test_train_distributed_routes_grid_mesh)
    from gp_tpu.parallel import pgp
    mesh1 = make_mesh(8, axis_name="rows")
    h1, L1, inv1, ok1 = pgp.pset_k(m.kernel, m._hyps, m._x, m._y, mesh1,
                                   block=4)
    assert ok1
    mu_a, s2_a = pgp.ppredict(m.kernel, h1, m._x, L1, inv1,
                              m._as_batch(Xs), mesh1, block=4)
    np.testing.assert_allclose(mu, np.asarray(mu_a), rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(s2, np.asarray(s2_a), rtol=1e-8, atol=1e-8)

    p = str(tmp_path / "grid.npz")
    m.save(p)
    m2 = GP.load(p)
    with pytest.raises(RuntimeError, match="restore_distributed"):
        m2.batch_predict(Xs)
    m2.restore_distributed(mesh)
    assert {"rowg", "colg"} <= set(m2._post_dist[0].axis_names)
    mu2, s22 = m2.batch_predict(Xs)
    np.testing.assert_allclose(mu2, mu, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(s22, s2, rtol=1e-10, atol=1e-12)

    # wrong-layout meshes are rejected loudly
    m3 = GP.load(p)
    with pytest.raises(ValueError, match="grid"):
        m3.restore_distributed(make_mesh(8, axis_name="rows"))
    with pytest.raises(ValueError, match="grid"):
        m3.restore_distributed(_mesh(pc, pr))  # transposed grid
