"""Kernel-layer tests against independent NumPy formulas
(reference: CovSEard.cpp, CovSEiso.cpp)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gp_tpu.config import DBL_EPS, DBL_MAX, DBL_MIN
from gp_tpu.ops import sdist
from gp_tpu.ops.kernels import SE_ARD, SE_ISO, get_kernel


def _np_seard(chyp, x1, x2):
    d = x1.shape[1]
    ell = np.exp(chyp[:d])
    sf2 = np.exp(2 * chyp[d])
    diff = (x1[:, None, :] - x2[None, :, :]) / ell
    return sf2 * np.exp(-0.5 * np.sum(diff**2, axis=-1))


def _np_seiso(chyp, x1, x2):
    ell = np.exp(chyp[0])
    sf2 = np.exp(2 * chyp[1])
    diff = (x1[:, None, :] - x2[None, :, :]) / ell
    return sf2 * np.exp(-0.5 * np.sum(diff**2, axis=-1))


@pytest.fixture
def xy():
    rng = np.random.default_rng(7)
    x1 = rng.standard_normal((15, 4))
    x2 = rng.standard_normal((9, 4))
    y = rng.standard_normal(15)
    return x1, x2, y


def test_sqdist_matches_exact(xy):
    x1, x2, _ = xy
    a = np.asarray(sdist.sqdist(jnp.asarray(x1), jnp.asarray(x2)))
    b = np.asarray(sdist.sqdist_exact(jnp.asarray(x1), jnp.asarray(x2)))
    np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-10)
    v = np.asarray(sdist.sqdist_vm(jnp.asarray(x1[0]), jnp.asarray(x2)))
    np.testing.assert_allclose(v, b[0], rtol=1e-10, atol=1e-12)


def test_seard_k(xy):
    x1, x2, _ = xy
    chyp = np.array([0.3, -0.2, 0.5, 0.1, 0.7])
    K = np.asarray(SE_ARD.k(jnp.asarray(chyp), jnp.asarray(x1), jnp.asarray(x2)))
    np.testing.assert_allclose(K, _np_seard(chyp, x1, x2), rtol=1e-10)
    dk = np.asarray(SE_ARD.diag_k(jnp.asarray(chyp), jnp.asarray(x1)))
    np.testing.assert_allclose(dk, np.full(15, np.exp(2 * 0.7)), rtol=1e-12)


def test_seiso_k(xy):
    x1, x2, _ = xy
    chyp = np.array([0.4, -0.3])
    K = np.asarray(SE_ISO.k(jnp.asarray(chyp), jnp.asarray(x1), jnp.asarray(x2)))
    np.testing.assert_allclose(K, _np_seiso(chyp, x1, x2), rtol=1e-10)


def test_seard_default_hyp(xy):
    x1, _, y = xy
    hyp = SE_ARD.default_hyp(x1, y)
    np.testing.assert_allclose(hyp[:4], np.log(np.std(x1, axis=0, ddof=1)))
    assert hyp[4] == pytest.approx(np.log(np.std(y, ddof=1)))


def test_seiso_default_hyp(xy):
    x1, _, y = xy
    hyp = SE_ISO.default_hyp(x1, y)
    assert hyp[0] == 0.0
    assert hyp[1] == pytest.approx(np.log(np.std(y, ddof=1)))


def test_seard_hyp_range_formulas(xy):
    """Reproduce CovSEard::cov_hyp_range (CovSEard.cpp:41-71) by hand."""
    x1, _, y = xy
    lb, ub = SE_ARD.hyp_range(x1, y)
    for i in range(4):
        span = x1[:, i].max() - x1[:, i].min()
        exp_lb = np.log(0.05 * span) - 0.5 * np.log(-2 * np.log(1.5 * DBL_MIN))
        exp_ub = min(0.5 * np.log(0.05 * DBL_MAX),
                     np.log(span / np.sqrt(-2 * np.log(1 - 1e-4))))
        assert lb[i] == pytest.approx(exp_lb)
        assert ub[i] == pytest.approx(exp_ub)
    yr = y.max() - y.min()
    assert lb[4] == pytest.approx(np.log(max(DBL_EPS, DBL_EPS * yr)))
    assert ub[4] == pytest.approx(np.log(max(10 * DBL_EPS, 10 * yr)))


def test_seiso_hyp_range_intersection(xy):
    x1, _, y = xy
    lb, ub = SE_ISO.hyp_range(x1, y)
    lb_ard, ub_ard = SE_ARD.hyp_range(x1, y)
    assert lb[0] == pytest.approx(lb_ard[:4].max())
    assert ub[0] == pytest.approx(ub_ard[:4].min())
    yr = y.max() - y.min()
    assert lb[1] == pytest.approx(np.log(DBL_EPS * yr))
    assert ub[1] == pytest.approx(np.log(10 * yr))


def test_get_kernel_factory():
    assert get_kernel("se_ard") is SE_ARD
    assert get_kernel("SE_ISO") is SE_ISO
    assert get_kernel(SE_ARD) is SE_ARD
    with pytest.raises(ValueError):
        get_kernel("bogus_kernel")


def test_kernel_symmetry_and_psd(xy):
    x1, _, _ = xy
    chyp = np.zeros(5)
    K = np.asarray(SE_ARD.k(jnp.asarray(chyp), jnp.asarray(x1), jnp.asarray(x1)))
    np.testing.assert_allclose(K, K.T, atol=1e-12)
    w = np.linalg.eigvalsh(K)
    assert w.min() > -1e-10
