"""Global configuration for gp_tpu.

The reference library (Brightorange90/GP) is written against Eigen doubles
(C++11, `def.h:12` uses double INF everywhere).  For numerical parity we
enable JAX float64 by default; TPU compute paths explicitly use float32
(the MXU is bf16/f32) and the models pick a default dtype per backend.

Set the environment variable ``GP_TPU_X64=0`` to keep JAX in 32-bit mode.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# Mirror of the reference's global INF objective sentinel (def.h:12).
INF = float("inf")

# Default RNG seed, mirroring the reference's global engine seed
# (def.cpp:10-16).  Used when a model is constructed without an explicit key.
DEFAULT_SEED = 0

_X64 = os.environ.get("GP_TPU_X64", "1") != "0"
if _X64:
    jax.config.update("jax_enable_x64", True)


def x64_enabled() -> bool:
    return bool(jax.config.jax_enable_x64)


def default_dtype(platform: str | None = None) -> jnp.dtype:
    """Per-backend default dtype.

    float64 on CPU (parity with the reference's Eigen doubles), float32 on
    TPU/GPU where the matrix units are f32/bf16.
    """
    if platform is None:
        platform = jax.default_backend()
    if platform == "cpu" and x64_enabled():
        return jnp.float64
    return jnp.float32


def machine_eps(dtype) -> float:
    """numeric_limits<double>::epsilon() analog for the working dtype.

    NOTE: hyperparameter-range formulas (CovSEard.cpp:41-71) always use
    *double* limits in the reference; use `float_info` constants below for
    those, independent of compute dtype.
    """
    return float(jnp.finfo(dtype).eps)


# IEEE double limits used by the reference's hyper-range formulas
# (CovSEard.cpp:44,59,62,68-69); kept as host-side Python floats.
DBL_EPS = 2.220446049250313e-16
DBL_MIN = 2.2250738585072014e-308
DBL_MAX = 1.7976931348623157e+308
