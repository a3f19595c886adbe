"""Shared machinery for the sparse inducing-point models (FITC / VFE).

Reference: FITC.{h,cpp}, VFE.{h,cpp}.  Both models inherit the GP pipeline,
hold an inducing set U (defaulting to the full training set, FITC.cpp:12-13)
and a jitter that starts at (0.1 * noise_lb)^2 at train time (FITC.cpp:27-31)
and doubles on SPD failure in the posterior-cache step.

Neither model supports noise-free mode (FITC.cpp:36-40, VFE.cpp:35-39):
train() silently switches it off, as the reference does.
"""

from __future__ import annotations

import warnings

import jax.numpy as jnp
import numpy as np

from .base import GPBase


class SparseGPBase(GPBase):
    def __init__(self, train_x, train_y, kernel="se_ard", dtype=None, seed=0):
        super().__init__(train_x, train_y, kernel=kernel, dtype=dtype, seed=seed)
        self._u = self._x            # inducing default: full training set
        self._jitter_u = (0.1 * self._noise_lb) ** 2

    @property
    def num_inducing(self) -> int:
        return int(self._u.shape[0])

    @property
    def inducing(self):
        return self._u

    def set_inducing(self, u):
        """FITC::set_inducing (FITC.cpp:22-26)."""
        u = jnp.asarray(np.asarray(u, np.float64), self._dtype)
        if u.ndim != 2 or u.shape[1] != self._dim:
            raise ValueError(f"inducing points must be (M, {self._dim})")
        self._u = u
        self._trained = False
        self._invalidate_closures()

    def _reset_jitter(self):
        """FITC::_init (FITC.cpp:27-31): jitter re-derived at train start."""
        self._jitter_u = (0.1 * self._noise_lb) ** 2

    def train(self, init_hyps=None) -> float:
        if self._noise_free:
            warnings.warn(f"{type(self).__name__} can't be noise free; "
                          "disabling noise-free mode (reference behavior)")
            self._noise_free = False  # FITC.cpp:36-40: flag off, noise_lb kept
        self._reset_jitter()
        self._invalidate_closures()  # cached closures capture the jitter
        return super().train(init_hyps)

    def train_multistart(self, n_starts: int = 8, init_hyps=None) -> float:
        if self._noise_free:
            warnings.warn(f"{type(self).__name__} can't be noise free; "
                          "disabling noise-free mode (reference behavior)")
            self._noise_free = False
        self._reset_jitter()
        self._invalidate_closures()
        return super().train_multistart(n_starts=n_starts, init_hyps=init_hyps)
