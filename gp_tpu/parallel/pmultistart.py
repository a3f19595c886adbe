"""Multi-start hyperparameter fitting sharded across a device mesh.

The TPU-native replacement for the reference's MVMO global optimizer
(GP.cpp:463-485) at pod scale: the single-device version
(optim.multistart.multistart_lbfgsb) vmaps restarts into one batched
program; here the restart axis is additionally SHARDED over a mesh axis, so
each chip runs its slice of the L-BFGS-B population and only the final
(value, argmin) reduction crosses ICI.

No shard_map is needed: the batched L-BFGS-B program is embarrassingly
parallel over restarts, so annotating the batch axis with a NamedSharding
lets the XLA SPMD partitioner run it with zero communication until the
reduction.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import INF
from ..optim.lbfgsb import lbfgsb_impl
from ..optim.multistart import MultistartResult, sample_box


def pmultistart_lbfgsb(
    fun: Callable,
    key,
    lb,
    ub,
    x0,
    mesh: Mesh,
    axis_name: str = "starts",
    n_starts: int | None = None,
    max_evals: int = 160,
) -> MultistartResult:
    """n_starts bounded L-BFGS-B runs sharded over mesh axis `axis_name`.

    fun: vec -> (f, g), INF-sanitized (models' objective closures).
    n_starts defaults to one per device and is rounded up to a multiple of
    the mesh axis size so every shard is equally loaded.
    """
    n_dev = mesh.shape[axis_name]
    if n_starts is None:
        n_starts = n_dev
    n_starts = ((n_starts + n_dev - 1) // n_dev) * n_dev

    x0 = jnp.asarray(x0)
    starts = sample_box(key, lb, ub, n_starts - 1, x0.dtype)
    starts = jnp.concatenate([x0[None, :], starts], axis=0)

    batch_sh = NamedSharding(mesh, P(axis_name))
    rep_sh = NamedSharding(mesh, P())
    starts = jax.device_put(starts, batch_sh)

    @partial(jax.jit, out_shardings=(rep_sh, rep_sh, rep_sh, rep_sh))
    def run(starts):
        res = jax.vmap(
            lambda s: lbfgsb_impl(fun, s, lb, ub, max_evals=max_evals)
        )(starts)
        f = jnp.where(jnp.isfinite(res.f), res.f, INF)
        best = jnp.argmin(f)
        return res.x[best], res.f[best], res.f, res.x

    x, f, all_f, all_x = run(starts)
    return MultistartResult(x, f, all_f, all_x)
