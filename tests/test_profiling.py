"""Profiling helpers + optimizer status strings (aux subsystems)."""

import jax.numpy as jnp
import numpy as np

from gp_tpu.optim.lbfgsb import LBFGSBResult, explain_result
from gp_tpu.utils.profiling import Timer, phase


def test_phase_sink():
    out = []
    with phase("demo", sink=lambda n, dt: out.append((n, dt))):
        _ = jnp.ones((10, 10)) @ jnp.ones((10, 10))
    assert out and out[0][0] == "demo" and out[0][1] >= 0


def test_timer_accumulates():
    t = Timer()
    for _ in range(3):
        with t("step"):
            _ = jnp.ones(4) + 1
    assert t.count["step"] == 3
    assert "step" in str(t)


def _res(f, evals, converged):
    z = jnp.zeros(3)
    return LBFGSBResult(z, jnp.asarray(f), z, jnp.asarray(evals),
                        jnp.asarray(converged))


def test_explain_result_cases():
    assert "SUCCESS" in explain_result(_res(1.0, 12, True), max_evals=160)
    assert "MAXEVAL" in explain_result(_res(1.0, 160, False), max_evals=160)
    assert "STOPPED" in explain_result(_res(1.0, 30, False), max_evals=160)
    assert "FAILURE" in explain_result(_res(np.inf, 5, False), max_evals=160)
