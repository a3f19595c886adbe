"""Distributed exact-GP (parallel/pgp.py) vs the single-device path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gp_tpu import SE_ARD, SE_ISO
from gp_tpu.models import exact
from gp_tpu.models.base import default_hyps, hyp_range, sanitize_value_and_grad
from gp_tpu.parallel.mesh import make_mesh
from gp_tpu.parallel import pgp

NDEV = 8


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(NDEV, axis_name="rows")


@pytest.fixture(scope="module")
def prob():
    rng = np.random.default_rng(7)
    X = rng.uniform(-2, 2, (60, 3))          # 60 not a multiple of 8*4=32
    y = np.sin(X[:, 0]) - 0.3 * X[:, 1] ** 2 + 0.05 * rng.standard_normal(60)
    return jnp.asarray(X), jnp.asarray(y)


@pytest.mark.parametrize("kernel", [SE_ARD, SE_ISO], ids=["ard", "iso"])
def test_pnll_matches_single_device(mesh, prob, kernel):
    x, y = prob
    hyp = jnp.asarray(default_hyps(kernel, x, y, 1e-3, False))
    f_ref, g_ref = sanitize_value_and_grad(
        *jax.value_and_grad(lambda h: exact.nll_raw(kernel, h, x, y))(hyp))
    f, g = pgp.pnll_vg(kernel, hyp, x, y, mesh, block=4)
    np.testing.assert_allclose(float(f), float(f_ref), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-7, atol=1e-9)


def test_pnll_grad_multiple_points(mesh, prob):
    """Analytic distributed gradient == autodiff at several random hyps."""
    x, y = prob
    rng = np.random.default_rng(1)
    base = default_hyps(SE_ARD, x, y, 1e-3, False)
    for _ in range(3):
        hyp = jnp.asarray(base + 0.3 * rng.standard_normal(base.shape))
        f_ref, g_ref = jax.value_and_grad(
            lambda h: exact.nll_raw(SE_ARD, h, x, y))(hyp)
        f, g = pgp.pnll_vg(SE_ARD, hyp, x, y, mesh, block=4)
        np.testing.assert_allclose(float(f), float(f_ref), rtol=1e-9)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   rtol=1e-6, atol=1e-8)


def test_pfit_matches_single_device_fit(mesh, prob):
    x, y = prob
    hyp0 = jnp.asarray(default_hyps(SE_ARD, x, y, 1e-3, False))
    lb, ub = hyp_range(SE_ARD, x, y, 1e-3)
    lb, ub = jnp.asarray(lb), jnp.asarray(ub)
    vec0 = jnp.clip(hyp0, lb, ub)

    res_ref = exact.fit(SE_ARD, False, x, y, vec0, lb, ub, max_evals=60)
    res = pgp.pfit(SE_ARD, False, x, y, vec0, lb, ub, mesh, block=4,
                   max_evals=60)
    assert np.isfinite(float(res.f))
    # Same objective, same optimizer, same start: optima should agree tightly.
    np.testing.assert_allclose(float(res.f), float(res_ref.f),
                               rtol=1e-5, atol=1e-5)


def test_pset_k_and_ppredict(mesh, prob):
    x, y = prob
    rng = np.random.default_rng(2)
    xs = jnp.asarray(rng.uniform(-2, 2, (17, 3)))
    hyp = jnp.asarray(default_hyps(SE_ARD, x, y, 1e-3, False))

    hyp_ref, L_ref, invKys_ref, _ = exact.set_k(SE_ARD, hyp, x, y)
    mu_ref, s2_ref = exact.predict(SE_ARD, hyp_ref, x, L_ref, invKys_ref, xs)

    hyp_d, L, invKys, ok = pgp.pset_k(SE_ARD, hyp, x, y, mesh, block=4)
    assert ok
    np.testing.assert_allclose(np.asarray(hyp_d), np.asarray(hyp_ref),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(invKys), np.asarray(invKys_ref),
                               rtol=1e-8, atol=1e-9)
    mu, s2 = pgp.ppredict(SE_ARD, hyp_d, x, L, invKys, xs, mesh, block=4)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s2_ref),
                               rtol=1e-7, atol=1e-10)


def test_pset_k_noise_inflation(mesh):
    """Duplicated points + tiny noise force the inflation rescue loop."""
    rng = np.random.default_rng(3)
    X = np.repeat(rng.uniform(-1, 1, (16, 2)), 2, axis=0)
    y = np.sin(X[:, 0])
    x, y = jnp.asarray(X), jnp.asarray(y)
    hyp = default_hyps(SE_ARD, x, y, 1e-3, False)
    hyp[-2] = np.log(1e-12)                    # absurdly small noise
    hyp_d, L, invKys, ok = pgp.pset_k(SE_ARD, jnp.asarray(hyp), x, y, mesh,
                                      block=4)
    assert ok
    assert np.all(np.isfinite(np.asarray(invKys)))
    assert float(hyp_d[-2]) > np.log(1e-12)    # noise was inflated


def test_gp_train_distributed_api(mesh, prob):
    """Model-level distributed training: same basin as single-device train,
    sharded posterior serves every predict call."""
    from gp_tpu import GP
    x, y = prob
    Xs = np.asarray(x)[:10] + 0.05

    g1 = GP(np.asarray(x), np.asarray(y))
    n1 = g1.train()
    g2 = GP(np.asarray(x), np.asarray(y))
    n2 = g2.train_distributed(mesh, block=4)
    span = abs(n1) + 1.0
    assert abs(n2 - n1) < 0.02 * span

    mu1, s21 = g1.batch_predict(Xs)
    mu2, s22 = g2.batch_predict(Xs)
    np.testing.assert_allclose(mu2, mu1, rtol=0.05, atol=0.02)
    assert np.all(s22 >= 0)
    # mean-only and s2-only paths work off the sharded posterior
    assert np.all(np.isfinite(g2.batch_predict_y(Xs)))
    assert np.all(g2.batch_predict_s2(Xs) >= 0)


def test_distributed_predict_with_grad(mesh, prob):
    """BO acquisition path off the sharded posterior: gradients match finite
    differences of the model's own predictive surfaces."""
    from gp_tpu import GP
    x, y = prob
    g = GP(np.asarray(x), np.asarray(y))
    g.train_distributed(mesh, block=4)
    xs = np.asarray(x)[:3] + 0.07

    yv, gy = g.batch_predict_y_with_grad(xs)
    s2, gs2 = g.batch_predict_s2_with_grad(xs)
    assert gy.shape == xs.shape and gs2.shape == xs.shape

    eps = 1e-5
    for t in range(2):
        for i in range(xs.shape[1]):
            e = np.zeros_like(xs[t]); e[i] = eps
            fd_y = (g.batch_predict_y(xs[t] + e)[0]
                    - g.batch_predict_y(xs[t] - e)[0]) / (2 * eps)
            np.testing.assert_allclose(gy[t, i], fd_y, rtol=2e-4, atol=1e-7)
            fd_s2 = (g.batch_predict_s2(xs[t] + e)[0]
                     - g.batch_predict_s2(xs[t] - e)[0]) / (2 * eps)
            np.testing.assert_allclose(gs2[t, i], fd_s2, rtol=2e-3, atol=1e-7)


def test_pfit_hosted_matches_pfit(mesh):
    """The host-driven distributed fit (one pnll_vg program per eval —
    the watchdog-safe route train_distributed takes at large N) reaches
    the same optimum as the monolithic jitted pfit."""
    rng = np.random.default_rng(3)
    n, d = 64, 2
    X = rng.standard_normal((n, d))
    y = np.sin(1.5 * X[:, 0]) + 0.1 * rng.standard_normal(n)
    from gp_tpu.models.base import default_hyps, hyp_range

    hyp0 = default_hyps(SE_ARD, X, y, 1e-3, False)
    lb, ub = hyp_range(SE_ARD, X, y, 1e-3)
    vec0 = np.clip(hyp0, lb, ub)

    res_m = pgp.pfit(SE_ARD, False, X, y, vec0, lb, ub, mesh, block=4,
                     max_evals=60)
    res_h = pgp.pfit_hosted(SE_ARD, False, X, y, vec0, lb, ub, mesh,
                            block=4, max_evals=60)
    # same basin, not same point: host-numpy vs on-device optimizer
    # arithmetic follow slightly different line-search trajectories
    np.testing.assert_allclose(float(res_h.f), float(res_m.f), rtol=5e-3)
    np.testing.assert_allclose(np.asarray(res_h.x), np.asarray(res_m.x),
                               rtol=0.2, atol=0.1)
    # and the hosted endpoint is a real optimum of the SAME objective:
    # its value re-evaluated through the monolithic path's pnll agrees
    f_re, _ = pgp.pnll_vg(SE_ARD, res_h.x, X, y, mesh, block=4)
    np.testing.assert_allclose(float(f_re), float(res_h.f), rtol=1e-9)


def test_train_distributed_watchdog_routing(mesh, monkeypatch):
    """train_distributed must route to pfit_hosted past the per-device
    work threshold (the monolithic jitted program breaches the remote
    runtime's single-execution watchdog at real scale)."""
    rng = np.random.default_rng(4)
    n, d = 64, 2
    X = rng.standard_normal((n, d))
    y = np.sin(1.5 * X[:, 0]) + 0.1 * rng.standard_normal(n)
    from gp_tpu import GP

    calls = {}
    real_hosted = pgp.pfit_hosted

    def spy(*a, **k):
        calls["hosted"] = True
        return real_hosted(*a, **k)

    monkeypatch.setattr(pgp, "pfit_hosted", spy)
    gp = GP(X, y)
    res_small = gp.train_distributed(mesh, block=4)      # monolithic path
    assert "hosted" not in calls
    assert np.isfinite(res_small)

    # lower the threshold: the same entry must now route hosted
    monkeypatch.setattr(exact, "_DIST_HOSTED_WORK", 1)
    gp2 = GP(X, y)
    res_hosted = gp2.train_distributed(mesh, block=4)
    assert calls.get("hosted")
    assert np.isfinite(res_hosted)
    assert abs(res_hosted - res_small) < 0.01 * (abs(res_small) + 1.0)


def test_train_distributed_warm_start_probe(monkeypatch):
    """Round 5: train_distributed from DEFAULT inits at (mocked) stream
    scale runs the subset-MLE warm-start probe the single-chip train()
    uses (the measured N=51200 noise-basin trap) and still converges;
    an explicit user init skips the probe."""
    from gp_tpu import GP
    from gp_tpu.models import exact as exact_mod
    from gp_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(9)
    n, d = 96, 2
    X = rng.uniform(-2, 2, (n, d))
    y = np.sin(2 * X[:, 0]) + 0.05 * rng.standard_normal(n)
    mesh = make_mesh(8, "rows")

    monkeypatch.setattr(exact_mod, "_STREAM_MIN_N", 1)
    probed = []
    m0 = GP(X, y)
    orig = m0.subset_init_hyps

    def spy(*a, **k):
        probed.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(m0, "subset_init_hyps", spy)
    nll = m0.train_distributed(mesh, block=4)
    assert np.isfinite(nll)
    assert probed, "default-init distributed fit must run the warm probe"

    probed.clear()
    m1 = GP(X, y)
    monkeypatch.setattr(m1, "subset_init_hyps", spy)
    nll1 = m1.train_distributed(mesh, block=4,
                                init_hyps=m1.get_default_hyps())
    assert np.isfinite(nll1)
    assert not probed, "explicit init must skip the probe"
