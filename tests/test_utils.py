"""Unit tests for gp_tpu.utils (reference: util.{h,cpp})."""

import numpy as np
import pytest
import scipy.stats

from gp_tpu.utils import io, stats


def test_stdvar_stddev_unbiased():
    rng = np.random.default_rng(1)
    v = rng.standard_normal(97)
    assert float(stats.stdvar(v)) == pytest.approx(np.var(v, ddof=1), rel=1e-12)
    assert float(stats.stddev(v)) == pytest.approx(np.std(v, ddof=1), rel=1e-12)


def test_normpdf_normcdf():
    x = np.linspace(-6, 6, 41)
    np.testing.assert_allclose(np.asarray(stats.normpdf(x)),
                               scipy.stats.norm.pdf(x), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(stats.normcdf(x)),
                               scipy.stats.norm.cdf(x), rtol=1e-12)


def test_logphi_three_branches():
    # covers the |x| small, very-negative, and erfc branches (util.cpp:142-180)
    x = np.array([-30.0, -15.0, -11.4, -11.2, -5.0, -0.2, -0.1, 0.0,
                  0.1, 0.2, 1.0, 5.0])
    lp, dlp = stats.logphi(x)
    np.testing.assert_allclose(np.asarray(lp), scipy.stats.norm.logcdf(x),
                               rtol=1e-6, atol=1e-12)
    # derivative: d/dx log Phi = pdf/cdf
    expected_dlp = np.exp(scipy.stats.norm.logpdf(x) - scipy.stats.norm.logcdf(x))
    np.testing.assert_allclose(np.asarray(dlp), expected_dlp, rtol=1e-5)


def test_feasibility_rule():
    # rows: [objective, constraints...]; feasible iff all constraints <= 0
    recs = np.array([
        [5.0, -1.0, 0.0],   # feasible, obj 5
        [1.0, 2.0, 0.0],    # infeasible, viol 2
        [3.0, -2.0, -1.0],  # feasible, obj 3  <- best
        [0.0, 0.5, 0.5],    # infeasible, viol 1
    ])
    assert float(stats.violation(recs[1])) == 2.0
    assert bool(stats.is_feas(recs[0]))
    assert not bool(stats.is_feas(recs[1]))
    assert bool(stats.better(recs[2], recs[0]))      # lower feasible obj
    assert bool(stats.better(recs[0], recs[1]))      # feasible beats infeasible
    assert bool(stats.better(recs[3], recs[1]))      # lower violation
    idx, best = stats.find_best(recs)
    assert int(idx) == 2

    # all infeasible -> least violation wins
    recs2 = np.array([[0.0, 3.0], [10.0, 1.0], [5.0, 2.0]])
    idx2, _ = stats.find_best(recs2)
    assert int(idx2) == 1


def test_find_best_xy():
    ys = np.array([[2.0], [1.0], [3.0]])
    xs = np.array([[10.0, 20.0, 30.0], [1.0, 2.0, 3.0]])  # (dim, n)
    bx, by = stats.find_best_xy(xs, ys)
    np.testing.assert_allclose(np.asarray(bx), [20.0, 2.0])
    assert float(by[0]) == 1.0


def test_rand_matrix_bounds():
    import jax
    lb = np.array([-1.0, 0.0, 5.0])
    ub = np.array([1.0, 10.0, 6.0])
    m = np.asarray(stats.rand_matrix(jax.random.PRNGKey(0), 200, lb, ub))
    assert m.shape == (3, 200)
    assert (m >= lb[:, None]).all() and (m <= ub[:, None]).all()
    # actually spreads across the box
    assert m.std(axis=1).min() > 0.05


def test_read_matrix_reference_data():
    X = io.read_matrix("/root/reference/data/train_x")
    y = io.read_matrix("/root/reference/data/train_y")
    assert X.shape == (8000, 24)
    assert y.shape == (8000, 1)
    expected = np.loadtxt("/root/reference/data/train_x", max_rows=3)
    np.testing.assert_allclose(X[:3], expected, rtol=0, atol=0)


def test_native_fastio_matches_numpy(tmp_path):
    from gp_tpu.native import fastio
    rng = np.random.default_rng(3)
    m = rng.standard_normal((57, 13))
    p = tmp_path / "m.txt"
    io.write_matrix(str(p), m)
    a = fastio.read_matrix(str(p))
    if a is None:
        import pytest
        pytest.skip("native loader unavailable")
    np.testing.assert_allclose(a, np.loadtxt(str(p)), rtol=0, atol=0)


def test_write_pred_roundtrip(tmp_path):
    mean = np.array([1.0, 2.0, 3.0])
    sd = np.array([0.1, 0.2, 0.3])
    p = tmp_path / "pred"
    io.write_pred(str(p), mean, sd)
    rec = io.read_matrix(str(p))
    np.testing.assert_allclose(rec[:, 0], mean)
    np.testing.assert_allclose(rec[:, 1], sd)


def test_native_write_matrix_roundtrip(tmp_path):
    """Native buffered writer (fastio.gp_write_matrix) round-trips exactly."""
    from gp_tpu.utils.io import read_matrix, write_matrix

    rng = np.random.default_rng(42)
    m = rng.standard_normal((137, 5)) * 10.0 ** rng.integers(-8, 8, (137, 5))
    p = str(tmp_path / "m.txt")
    write_matrix(p, m)
    back = read_matrix(p)
    np.testing.assert_allclose(back, m, rtol=1e-15)

    # vector input becomes a column
    write_matrix(p, np.arange(4.0))
    assert read_matrix(p).shape == (4, 1)
