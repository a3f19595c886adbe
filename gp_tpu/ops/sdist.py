"""Pairwise squared Euclidean distances.

TPU-native replacement for the reference's sdist_mm column loop
(util.cpp:63-80).  The default path is the matmul form — one (n1,d)x(d,n2)
contraction on the MXU plus rank-1 row/col norm corrections, clamped at 0
(the clamp mirrors the cancellation guard the reference comments mention).

For small feature dimension an exact difference-based path is available
(`sqdist_exact`): it avoids catastrophic cancellation entirely and is the
numerically faithful analog of the reference's per-column loop, at O(n1*n2*d)
VPU work instead of an MXU matmul.
"""

from __future__ import annotations

import jax.numpy as jnp


def sqdist(x1, x2):
    """Squared distances between rows of x1 (n1,d) and rows of x2 (n2,d).

    Returns (n1, n2). Uses the MXU-friendly |a|^2 + |b|^2 - 2ab form.
    """
    x1 = jnp.asarray(x1)
    x2 = jnp.asarray(x2)
    n1sq = jnp.sum(x1 * x1, axis=1)[:, None]
    n2sq = jnp.sum(x2 * x2, axis=1)[None, :]
    cross = x1 @ x2.T
    return jnp.maximum(n1sq + n2sq - 2.0 * cross, 0.0)


def sqdist_exact(x1, x2):
    """Difference-based squared distances (no cancellation), O(n1*n2*d)."""
    x1 = jnp.asarray(x1)
    x2 = jnp.asarray(x2)
    diff = x1[:, None, :] - x2[None, :, :]
    return jnp.sum(diff * diff, axis=-1)


def sqdist_vm(v, m):
    """Squared distances between a single point v (d,) and rows of m (n,d)."""
    diff = m - v[None, :]
    return jnp.sum(diff * diff, axis=-1)
