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

# TPU MXU matmul precision.  The hardware default multiplies f32 operands
# as single-pass bfloat16 (~8 mantissa bits) — enough for neural nets,
# catastrophic for kernel-matrix factorizations: the MLE optimizer stalls
# on a bf16-noise plateau (measured: exact-GP fit on the bundled N=2500
# workload collapses to the constant predictor with "default", converges
# to the f64 optimum with "high").  "high" = 3-pass bf16 (~f32-quality
# products at ~1/3 MXU peak); "highest" = full f32 emulation.  Override
# with GP_TPU_MATMUL_PRECISION=default|high|highest.
_PREC = os.environ.get("GP_TPU_MATMUL_PRECISION", "high")
if _PREC != "default":
    jax.config.update("jax_default_matmul_precision", _PREC)

# Debug mode — analog of the reference's -DMYDEBUG build
# (CMakeLists.txt:15-30): NaN poisoning via jax_debug_nans (the counterpart
# of EIGEN_INITIALIZE_MATRICES_BY_NAN + MYASSERT) and disabled jit donation
# surprises.  NOTE: the INF-objective rescue paths (GP.cpp:147-148)
# intentionally produce non-finite values during optimization, so debug
# mode is for unit-level debugging, not full training runs.
DEBUG = os.environ.get("GP_TPU_DEBUG", "0") == "1"
if DEBUG:
    jax.config.update("jax_debug_nans", True)

# Persistent XLA compilation cache (first TPU compile of a jitted train()
# is ~20-240 s; cached re-runs are instant).  Opt out with
# GP_TPU_COMPILE_CACHE=0, redirect with GP_TPU_COMPILE_CACHE=<dir>.
_CACHE = os.environ.get("GP_TPU_COMPILE_CACHE",
                        os.path.expanduser("~/.cache/gp_tpu_xla"))
if _CACHE and _CACHE != "0":
    try:
        jax.config.update("jax_compilation_cache_dir", _CACHE)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:  # pragma: no cover - older jax
        pass


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
