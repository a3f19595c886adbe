"""Device-mesh helpers.

The reference library is entirely serial (SURVEY.md section 2, "Parallelism &
distributed communication"); the TPU build introduces first-class
parallelism over a `jax.sharding.Mesh`:

  * axis "starts" — hyperparameter restarts (the MVMO/multi-start axis),
  * axis "rows"   — block-rows of the N x N kernel matrix (the distributed
                    blocked Cholesky axis, gp_tpu.parallel.pchol).

Collectives ride ICI within a slice (psum / all_gather / ppermute); nothing
here ever falls back to host transfers.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "rows",
              devices=None) -> Mesh:
    """1-D mesh over the first `n_devices` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh_2d(n_starts: int, n_rows: int, devices=None) -> Mesh:
    """2-D (starts, rows) mesh: restarts x matrix-block parallelism."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[: n_starts * n_rows]).reshape(n_starts, n_rows)
    return Mesh(devices, ("starts", "rows"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def row_sharded(mesh: Mesh, axis_name: str = "rows") -> NamedSharding:
    """Shard the leading array axis over one mesh axis."""
    return NamedSharding(mesh, P(axis_name))
