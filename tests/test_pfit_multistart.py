"""2-D (starts x rows) distributed multi-start fit (pgp.pfit_multistart)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gp_tpu import SE_ARD
from gp_tpu.models import exact
from gp_tpu.models.base import default_hyps, hyp_range
from gp_tpu.optim.multistart import sample_box
from gp_tpu.parallel.mesh import make_mesh_2d
from gp_tpu.parallel import pgp


@pytest.fixture(scope="module")
def mesh2d():
    return make_mesh_2d(2, 4)          # 2 restarts x 4-way sharded Cholesky


def test_pfit_multistart(mesh2d):
    rng = np.random.default_rng(21)
    X = rng.uniform(-2, 2, (48, 3))
    y = np.sin(X[:, 0]) + 0.1 * rng.standard_normal(48)
    x, yv = jnp.asarray(X), jnp.asarray(y)

    hyp0 = jnp.asarray(default_hyps(SE_ARD, x, yv, 1e-3, False))
    lb, ub = hyp_range(SE_ARD, x, yv, 1e-3)
    lb, ub = jnp.asarray(lb), jnp.asarray(ub)
    starts = jnp.stack([jnp.clip(hyp0, lb, ub),
                        sample_box(jax.random.PRNGKey(0), lb, ub, 1,
                                   hyp0.dtype)[0]])

    best_x, best_f = pgp.pfit_multistart(SE_ARD, False, x, yv, starts, lb,
                                         ub, mesh2d, block=4, max_evals=40)
    assert np.isfinite(float(best_f))

    # the reported optimum value must match the single-device objective
    check = float(exact.nll(SE_ARD, jnp.asarray(np.asarray(best_x)), x, yv))
    np.testing.assert_allclose(float(best_f), check, rtol=1e-8)

    # and must be at least as good as a plain single-start local fit
    res_ref = exact.fit(SE_ARD, False, x, yv, jnp.clip(hyp0, lb, ub), lb,
                        ub, max_evals=40)
    assert float(best_f) <= float(res_ref.f) + 1e-3
