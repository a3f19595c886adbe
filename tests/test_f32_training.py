"""float32 training quality — the TPU-dtype regression guard.

On TPU the models run float32 (config.default_dtype), and the MXU's
single-pass-bf16 matmul default silently destroyed optimizer progress
(fit collapsed to the constant predictor) until config.py forced
jax_default_matmul_precision="high".  These tests pin the f32 pipeline on
the bundled data: the fit must actually descend, not stall at the start.
"""

import numpy as np
import pytest

from gp_tpu import GP, FITC
from gp_tpu.utils.io import read_matrix

REF = "/root/reference/data"


@pytest.fixture(scope="module")
def bundled():
    X = read_matrix(f"{REF}/train_x")[:800]
    y = read_matrix(f"{REF}/train_y")[:800].ravel()
    Xs = read_matrix(f"{REF}/test_x")[:500]
    ys = read_matrix(f"{REF}/test_y")[:500].ravel()
    return X, y, Xs, ys


def test_exact_gp_f32_fit_descends(bundled):
    X, y, Xs, ys = bundled
    m32 = GP(X, y, dtype="float32")
    nll_start = m32.nll(m32.get_default_hyps())
    nll32 = m32.train()
    assert nll32 < nll_start - 100, "f32 fit stalled at the default hyps"
    rmse = float(np.sqrt(np.mean((m32.batch_predict_y(Xs) - ys) ** 2)))
    assert rmse < 0.6 * ys.std()


def test_exact_gp_f32_close_to_f64(bundled):
    X, y, _, _ = bundled
    nll32 = GP(X, y, dtype="float32").train()
    nll64 = GP(X, y, dtype="float64").train()
    # same basin: a few per-mille of |NLL| covers f32 rounding drift
    assert abs(nll32 - nll64) < 0.01 * abs(nll64) + 5.0


def test_fitc_defaults_to_f64_and_fits(bundled):
    """Sparse models default to float64 compute (see SparseGPBase docstring:
    the FITC Gamma cancellation makes float32 objectives garbage near small
    noise), so a default-constructed FITC must fit well on any backend."""
    import jax.numpy as jnp
    X, y, Xs, ys = bundled
    m = FITC(X, y)
    assert m.dtype == jnp.float64
    nll_start = m.nll(m.get_default_hyps())
    m.set_inducing(X[:128])
    nll = m.train()
    assert nll < nll_start - 100
    rmse = float(np.sqrt(np.mean((m.batch_predict_y(Xs) - ys) ** 2)))
    assert rmse < 0.8 * ys.std()


def test_fitc_explicit_f32_stays_finite(bundled):
    """Explicit float32 FITC is precision-limited but must stay finite and
    never degrade below the starting point (clamped Gamma guarantees a
    well-defined objective)."""
    X, y, Xs, ys = bundled
    m = FITC(X, y, dtype="float32")
    m.set_inducing(X[:128])
    nll_start = m.nll(m.get_default_hyps())
    nll = m.train()
    # f32 FITC objective noise is O(10) at this scale (the Gamma
    # cancellation); require finite and within-noise of the start
    assert np.isfinite(nll) and nll <= nll_start + 10.0
    assert np.all(np.isfinite(m.batch_predict_y(Xs)))
