"""Fail-loud rescue-exhaustion semantics (reference parity).

The reference's _setK loops until the factorization succeeds — it can
NEVER serve from a failed factor (GP.cpp:423-444, FITC.cpp:184-198,
VFE.cpp:146-158).  gp_tpu's rescue loops are capped, so exhaustion must
RAISE instead of silently caching a NaN posterior, on every path: dense
set_k, streamed set_k, FITC, VFE, bucketed set_k_masked (the distributed
analogs — pgp.pset_k / psparse.pset_k_sparse — already raised).

A NaN length scale is the forcing device: no amount of noise inflation or
jitter doubling can ever make K finite, so every rescue schedule exhausts
its cap — the capped analog of the reference looping forever.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gp_tpu import FITC, GP, VFE, BucketedGP
from gp_tpu.models import exact as exact_mod


def _problem(n=48, d=3, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, d))
    y = np.sin(X[:, 0]) + 0.1 * rng.standard_normal(n)
    return X, y


def _poison(model):
    """Install hyps whose kernel matrix is NaN (unrescuable)."""
    h = np.asarray(model.get_default_hyps(), np.float64)
    h[0] = np.nan
    model._hyps = jnp.asarray(h, model._dtype)


def test_gp_dense_update_posterior_raises():
    X, y = _problem()
    m = GP(X, y)
    _poison(m)
    with pytest.raises(RuntimeError, match="refusing to cache"):
        m._update_posterior()
    # nothing was cached: the model cannot serve from the failed attempt
    assert m._post is None
    assert not m.trained


def test_gp_stream_update_posterior_raises(monkeypatch):
    """The factor-as-temp stream path (set_k_streamed) must also refuse."""
    monkeypatch.setattr(exact_mod, "_STREAM_MIN_N", 1)
    X, y = _problem()
    m = GP(X, y)
    assert m._in_stream_regime()
    _poison(m)
    with pytest.raises(RuntimeError, match="refusing to cache"):
        m._update_posterior()
    assert m._post is None


def test_set_k_ok_flag():
    """exact.set_k reports ok=False on exhaustion, ok=True on success."""
    from gp_tpu import SE_ARD
    from gp_tpu.models.base import default_hyps

    X, y = _problem()
    hyp = jnp.asarray(default_hyps(SE_ARD, X, y, 1e-3, False))
    _, _, _, ok = exact_mod.set_k(SE_ARD, hyp, jnp.asarray(X),
                                  jnp.asarray(y))
    assert bool(ok)
    bad = hyp.at[0].set(jnp.nan)
    _, _, _, ok = exact_mod.set_k(SE_ARD, bad, jnp.asarray(X),
                                  jnp.asarray(y), max_tries=2)
    assert not bool(ok)


@pytest.mark.parametrize("cls", [FITC, VFE])
def test_sparse_update_posterior_raises(cls):
    X, y = _problem()
    m = cls(X, y)
    m.set_inducing(X[:8])
    _poison(m)
    with pytest.raises(RuntimeError, match="refusing to cache"):
        m._update_posterior()
    assert m._post is None


def test_bucketed_update_posterior_raises():
    X, y = _problem(n=20)
    m = BucketedGP(X, y, bucket=32)
    _poison(m)
    with pytest.raises(RuntimeError, match="refusing to cache"):
        m._update_posterior()
    assert m._post is None


def test_rescue_success_still_caches():
    """A rescuable (merely singular) K must still succeed as before."""
    rng = np.random.default_rng(1)
    X = np.repeat(rng.standard_normal((24, 3)), 2, axis=0)  # duplicated rows
    y = rng.standard_normal(48)
    m = GP(X, y)
    h = np.asarray(m.get_default_hyps(), np.float64)
    h[-2] = np.log(1e-12)  # tiny noise: forces the inflation loop
    m._hyps = jnp.asarray(h, m._dtype)
    m._update_posterior()                       # must NOT raise
    assert m._post is not None
    assert np.all(np.isfinite(np.asarray(m._post[-1])))
