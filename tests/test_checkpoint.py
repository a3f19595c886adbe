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


def test_roundtrip_preserves_solver(tmp_path, toy_problem):
    """A QR-trained model must reload with the QR solver (a Cholesky solve
    applied to (Q, R) factors silently corrupts predictive variances)."""
    X, y, Xs, _ = toy_problem
    m = GP(X, y, solver="qr")
    m.train()
    mu, s2 = m.batch_predict(Xs)
    p = str(tmp_path / "qr.npz")
    m.save(p)
    m2 = GP.load(p)
    assert m2.solver.name == "qr"
    mu2, s22 = m2.batch_predict(Xs)
    np.testing.assert_array_equal(mu2, mu)
    np.testing.assert_array_equal(s22, s2)


def test_roundtrip_bucketed(tmp_path, toy_problem):
    from gp_tpu import BucketedGP
    X, y, Xs, _ = toy_problem
    m = BucketedGP(X, y, bucket=16)
    m.train()
    mu, s2 = m.batch_predict(Xs)
    p = str(tmp_path / "b.npz")
    m.save(p)
    m2 = BucketedGP.load(p)
    assert m2.trained and m2.capacity == m.capacity
    mu2, s22 = m2.batch_predict(Xs)
    np.testing.assert_array_equal(mu2, mu)
    np.testing.assert_array_equal(s22, s2)


def test_distributed_posterior_roundtrip(tmp_path, toy_problem):
    """Sharded posterior -> .npz -> restore_distributed on a fresh mesh:
    identical predictions, no refactorization (SURVEY.md:416-418)."""
    from gp_tpu.parallel.mesh import make_mesh
    X, y, Xs, _ = toy_problem
    m = GP(X, y)
    m.train_distributed(make_mesh(8, "rows"), block=4)
    mu, s2 = m.batch_predict(Xs)

    p = str(tmp_path / "d.npz")
    m.save(p)
    m2 = GP.load(p)
    assert m2.trained
    # serving before restore_distributed: informative error, not a crash
    with pytest.raises(RuntimeError, match="restore_distributed"):
        m2.batch_predict(Xs)
    m2.restore_distributed(make_mesh(8, "rows"))
    mu2, s22 = m2.batch_predict(Xs)
    np.testing.assert_allclose(mu2, mu, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(s22, s2, rtol=1e-10, atol=1e-12)
    # wrong mesh size is rejected
    m3 = GP.load(p)
    with pytest.raises(ValueError, match="8 devices"):
        m3.restore_distributed(make_mesh(4, "rows"))


@pytest.mark.parametrize("layout", ["rows", "grid"])
def test_sharded_checkpoint_roundtrip(tmp_path, toy_problem, layout):
    """Pod-scale sharded checkpoint (round 5): per-process shard files,
    no full-L gather — save_model_sharded -> load_model_sharded on the
    same layout reproduces predictions bitwise, for both the 1-D and the
    2-D grid posterior."""
    import jax
    from jax.sharding import Mesh

    from gp_tpu.parallel import pchol2d
    from gp_tpu.parallel.mesh import make_mesh
    from gp_tpu.utils.checkpoint import (load_model_sharded,
                                         save_model_sharded)

    X, y, Xs, _ = toy_problem
    if layout == "rows":
        mesh = make_mesh(8, "rows")
    else:
        devs = np.asarray(jax.devices("cpu")[:8]).reshape(2, 4)
        mesh = Mesh(devs, (pchol2d.AXR, pchol2d.AXC))
    m = GP(X, y)
    m.train_distributed(mesh, block=4)
    mu, s2 = m.batch_predict(Xs)

    d = str(tmp_path / "sharded")
    save_model_sharded(m, d)
    m2 = load_model_sharded(d, mesh)
    assert m2.trained
    mu2, s22 = m2.batch_predict(Xs)
    np.testing.assert_array_equal(mu2, mu)
    np.testing.assert_array_equal(s22, s2)
    np.testing.assert_allclose(np.asarray(m2.get_hyp()),
                               np.asarray(m.get_hyp()), rtol=0)

    # wrong layout rejected loudly
    wrong = (make_mesh(8, "rows") if layout == "grid"
             else Mesh(np.asarray(jax.devices("cpu")[:8]).reshape(2, 4),
                       (pchol2d.AXR, pchol2d.AXC)))
    with pytest.raises(ValueError, match="blocked for"):
        load_model_sharded(d, wrong)
