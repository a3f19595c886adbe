"""Checkpoint round-trips: fitted model -> .npz -> identical predictions."""

import numpy as np
import pytest

from gp_tpu import GP, FITC, VFE


@pytest.mark.parametrize("cls", [GP, FITC, VFE], ids=["gp", "fitc", "vfe"])
def test_roundtrip_trained(tmp_path, toy_problem, cls):
    X, y, Xs, _ = toy_problem
    m = cls(X, y)
    if cls is not GP:
        m.set_inducing(X[:20])
    m.train()
    mu, s2 = m.batch_predict(Xs)

    p = str(tmp_path / "model.npz")
    m.save(p)
    m2 = cls.load(p)

    assert m2.trained
    np.testing.assert_array_equal(m2.get_hyp(), m.get_hyp())
    mu2, s22 = m2.batch_predict(Xs)
    np.testing.assert_array_equal(mu2, mu)
    np.testing.assert_array_equal(s22, s2)


def test_roundtrip_untrained(tmp_path, toy_problem):
    X, y, _, _ = toy_problem
    m = GP(X, y)
    p = str(tmp_path / "model.npz")
    m.save(p)
    m2 = GP.load(p)
    assert not m2.trained
    with pytest.raises(RuntimeError):
        m2.batch_predict(X)
    # still trainable after resume
    nlz = m2.train()
    assert np.isfinite(nlz)


def test_load_preserves_flags(tmp_path, toy_problem):
    X, y, _, _ = toy_problem
    m = GP(X, y)
    m.set_noise_lower_bound(0.05)
    m.set_fixed(True)
    p = str(tmp_path / "model.npz")
    m.save(p)
    m2 = GP.load(p)
    assert m2._noise_lb == 0.05
    assert m2._fixhyps
