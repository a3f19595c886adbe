"""Degenerate inputs: tiny N, d=1, constant targets, validation errors."""

import numpy as np
import pytest

from gp_tpu import GP, FITC


def test_tiny_problem_trains():
    X = np.array([[0.0], [1.0], [2.0]])
    y = np.array([0.0, 1.0, 0.5])
    m = GP(X, y)
    nlz = m.train()
    assert np.isfinite(nlz)
    mu, s2 = m.batch_predict(np.array([[0.5]]))
    assert np.isfinite(mu[0]) and s2[0] >= 0


def test_constant_targets():
    """std(y) = 0: the standardization guard (sigma -> 1) must keep the
    pipeline finite; the posterior mean collapses to the constant."""
    rng = np.random.default_rng(0)
    X = rng.uniform(-1, 1, (20, 2))
    y = np.full(20, 3.7)
    m = GP(X, y)
    nlz = m.train()
    assert np.isfinite(nlz)
    mu = m.batch_predict_y(X[:5])
    np.testing.assert_allclose(mu, 3.7, atol=1e-3)


def test_shape_validation():
    X = np.zeros((10, 2))
    y = np.zeros(10)
    with pytest.raises(ValueError):
        GP(np.zeros(10), y)                      # 1-D x
    with pytest.raises(ValueError):
        GP(X, np.zeros(7))                       # length mismatch
    m = GP(X, y)
    with pytest.raises(ValueError):
        m.add_data(np.zeros((3, 5)), np.zeros(3))   # wrong dim
    f = FITC(X, y)
    with pytest.raises(ValueError):
        f.set_inducing(np.zeros((4, 5)))         # wrong dim
    with pytest.raises(RuntimeError):
        m.batch_predict(X)                       # untrained


def test_single_test_point_apis(toy_problem):
    X, y, Xs, _ = toy_problem
    m = GP(X, y)
    m.train()
    y0, s20 = m.predict(Xs[0])
    assert np.isfinite(y0) and s20 >= 0
    yv, s2v, gy, gs2 = m.predict_with_grad(Xs[0])
    assert np.isfinite(yv) and gy.shape == (X.shape[1],)
