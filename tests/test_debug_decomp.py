"""Per-evaluation NLL decomposition under debug (MYDEBUG parity:
GP.cpp:144-146, VFE.cpp:242-245).

The knobs are read at TRACE time, so each test uses shapes no other test
traces (odd n) to defeat the jit cache."""

import numpy as np
import pytest

from gp_tpu import SE_ARD
from gp_tpu.models import exact, fitc, vfe
from gp_tpu.models.base import default_hyps


@pytest.fixture()
def debug_env(monkeypatch):
    monkeypatch.setenv("GP_TPU_DEBUG", "1")
    monkeypatch.setenv("GP_TPU_VERBOSE_OPT", "1")


def _problem(n, d, seed):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, d))
    y = np.sin(X[:, 0]) + 0.1 * rng.standard_normal(n)
    hyp = default_hyps(SE_ARD, X, y, 1e-3, False)
    return X, y, hyp


def test_exact_nll_decomposition_printed(debug_env, capfd):
    X, y, hyp = _problem(37, 3, 0)
    v = float(exact.nll(SE_ARD, hyp, X, y))
    out = capfd.readouterr()
    text = out.out + out.err
    assert "[GP_TPU_DEBUG] nll:" in text
    for term in ("data_fit=", "half_logdet=", "norm_const=", "nlz="):
        assert term in text
    # the printed decomposition reconstructs the returned value
    import re
    m = re.search(r"nlz=([-\d.e+]+) data_fit=([-\d.e+]+) "
                  r"half_logdet=([-\d.e+]+) norm_const=([-\d.e+]+)", text)
    assert m, text
    nlz, df, ld, nc = map(float, m.groups())
    np.testing.assert_allclose(df + ld + nc, nlz, rtol=1e-12)
    np.testing.assert_allclose(nlz, v, rtol=1e-12)


def test_exact_nll_vg_decomposition_printed(debug_env, capfd):
    import jax.numpy as jnp
    X, y, hyp = _problem(41, 2, 1)
    exact.nll_vg_raw(SE_ARD, jnp.asarray(hyp), jnp.asarray(X),
                     jnp.asarray(y))[0].block_until_ready()
    text = "".join(capfd.readouterr())
    assert "[GP_TPU_DEBUG] nll_vg:" in text


def test_sparse_nll_decomposition_printed(debug_env, capfd):
    import jax.numpy as jnp
    X, y, hyp = _problem(43, 2, 2)
    u = jnp.asarray(X[-7:])
    fitc.nll_raw(SE_ARD, jnp.asarray(hyp), jnp.asarray(X), jnp.asarray(y),
                 u, 1e-8).block_until_ready()
    vfe.nll_raw(SE_ARD, jnp.asarray(hyp), jnp.asarray(X), jnp.asarray(y),
                u, 1e-8).block_until_ready()
    text = "".join(capfd.readouterr())
    assert "[GP_TPU_DEBUG] fitc_nll:" in text
    assert "[GP_TPU_DEBUG] vfe_nll:" in text
    assert "complexity=" in text and "trace_term=" in text


def test_decomposition_silent_by_default(capfd):
    X, y, hyp = _problem(39, 2, 3)
    float(exact.nll(SE_ARD, hyp, X, y))
    text = "".join(capfd.readouterr())
    assert "[GP_TPU_DEBUG]" not in text
