"""BucketedGP: masked-capacity exact GP (BO add_data without recompiles)."""

import numpy as np
import pytest

from gp_tpu import GP
from gp_tpu.models.bucketed import BucketedGP
from gp_tpu.models import exact


@pytest.fixture()
def prob():
    rng = np.random.default_rng(3)
    X = rng.uniform(-2, 2, (45, 3))
    y = np.sin(X[:, 0]) + 0.3 * X[:, 1] + 0.05 * rng.standard_normal(45)
    Xs = rng.uniform(-2, 2, (12, 3))
    return X, y, Xs


def test_matches_plain_gp(prob):
    X, y, Xs = prob
    plain = GP(X, y)
    buck = BucketedGP(X, y, bucket=16)        # capacity 48, 3 pad rows
    n1, n2 = plain.train(), buck.train()
    np.testing.assert_allclose(n2, n1, rtol=1e-7)
    mu1, s21 = plain.batch_predict(Xs)
    mu2, s22 = buck.batch_predict(Xs)
    np.testing.assert_allclose(mu2, mu1, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(s22, s21, rtol=1e-6, atol=1e-9)
    y1, g1 = plain.batch_predict_y_with_grad(Xs[:3])
    y2, g2 = buck.batch_predict_y_with_grad(Xs[:3])
    # atol 1e-8: the two models optimize over different matrix sizes
    # (padded vs not), so their optima agree only to ~f64-accumulation
    # noise; tiny gradient elements (~3e-3) then differ at the 5e-9 level
    np.testing.assert_allclose(g2, g1, rtol=1e-6, atol=1e-8)
    s2a, gs1 = plain.batch_predict_s2_with_grad(Xs[:2])
    s2b, gs2 = buck.batch_predict_s2_with_grad(Xs[:2])
    np.testing.assert_allclose(gs2, gs1, rtol=1e-5, atol=1e-8)


def test_add_data_no_recompile(prob):
    X, y, Xs = prob
    rng = np.random.default_rng(9)
    buck = BucketedGP(X[:40], y[:40], bucket=16)   # capacity 48
    buck.train()
    n_traces = exact.fit_masked._cache_size()

    for i in range(8):                              # fill to exactly 48
        xi = rng.uniform(-2, 2, (1, 3))
        yi = np.sin(xi[:, 0])
        buck.add_data(xi, yi)
        buck.train()
        mu = buck.batch_predict_y(Xs)
        assert np.all(np.isfinite(mu))
    assert exact.fit_masked._cache_size() == n_traces, (
        "in-capacity add_data must not retrace the fit")

    # exceeding capacity grows the buffer -> exactly one new trace
    buck.add_data(rng.uniform(-2, 2, (1, 3)), [0.3])
    assert buck.capacity == 64
    buck.train()
    assert exact.fit_masked._cache_size() == n_traces + 1


def test_incremental_matches_batch(prob):
    """A BO-style loop ends in the same optimum basin as a from-scratch fit.

    Exact equality is not expected: in-capacity add_data freezes the
    y-standardization constants (that is what avoids recompiles), which
    perturbs the optimizer trajectory.  Both are optima of the same
    likelihood; require agreement to ~2%.
    """
    X, y, Xs = prob
    inc = BucketedGP(X[:40], y[:40], bucket=32)
    inc.add_data(X[40:], y[40:])
    n_inc = inc.train()

    scratch = BucketedGP(X, y, bucket=32)
    n_scr = scratch.train()
    span = abs(n_scr) + 1.0
    assert abs(n_inc - n_scr) < 0.02 * span
    # the incremental model evaluated through the scratch objective agrees
    check = scratch.nll(inc.get_hyp())
    np.testing.assert_allclose(n_inc, check, rtol=1e-6, atol=1e-6)
    mu_i = inc.batch_predict_y(Xs)
    mu_s = scratch.batch_predict_y(Xs)
    np.testing.assert_allclose(mu_i, mu_s, rtol=0.2, atol=0.05)


def test_absorb_matches_refactorization(prob):
    """O(cap^2) posterior append == full set_k refactorization."""
    X, y, Xs = prob
    rng = np.random.default_rng(13)

    fast = BucketedGP(X[:40], y[:40], bucket=16)
    fast.train()
    hyp = fast.get_hyp()

    slow = BucketedGP(X[:40], y[:40], bucket=16)
    slow.train()

    for i in range(5):
        xi = rng.uniform(-2, 2, 3)
        yi = float(np.sin(xi[0]))
        fast.absorb(xi, yi)
        slow.add_data(xi[None, :], [yi])
        slow._hyps = slow._hyps  # keep same hyps: no refit
        slow._update_posterior()
        slow._trained = True

        mu_f, s2_f = fast.batch_predict(Xs)
        mu_s, s2_s = slow.batch_predict(Xs)
        np.testing.assert_allclose(mu_f, mu_s, rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(s2_f, s2_s, rtol=1e-7, atol=1e-10)

    assert fast.num_train == 45
    np.testing.assert_allclose(fast.get_hyp(), hyp)   # hyps untouched
