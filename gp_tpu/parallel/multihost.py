"""Multi-host (multi-process) runtime.

The reference is a single-threaded library (SURVEY.md "Parallelism &
distributed communication": none).  The TPU build's pod-scale story
(SURVEY.md:270-278) needs every process of a multi-host slice to
participate in one global mesh:

  * `initialize()` wraps jax.distributed.initialize (coordinator
    rendezvous) — call it first in every process of the job.
  * `global_mesh()` builds a Mesh over ALL processes' devices
    (jax.devices() is global after initialization).
  * `pnll_vg` / `pfit` / `pset_k` mirror parallel/pgp's single-process
    entry points but convert host-local inputs to global (replicated)
    arrays first, so the same shard_map programs run unchanged across
    process boundaries — rows ride ICI inside a host, DCN between hosts,
    all through XLA collectives.
  * `pnll_vg2d` / `pfit2d` / `pset_k2d` / `ppredict2d` are the 2-D
    ("rowg", "colg") grid twins (parallel/pchol2d) — `global_mesh_2d()`
    puts each host on its own grid row so only the col-broadcasts cross
    DCN (~6x less host-crossing traffic per evaluation; BASELINE.md
    round-4 comm model).  These are the intended production entries on
    a multi-host pod.

Tested with multiple CPU processes (tests/test_multihost.py spawns two
4-device processes and checks bitwise agreement with the single-process
path); on a real pod slice the same code runs with the TPU backend.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.kernels import KernelSpec
from . import pchol2d, pgp
from .mesh import make_mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None) -> None:
    """Join (or create) the distributed job.

    With no arguments, jax auto-detects cluster environments (TPU pods,
    GKE, Slurm, ...); pass explicit values elsewhere.  Must run before any
    other jax call in the process.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def global_mesh(n_devices: int | None = None,
                axis_name: str = "rows") -> Mesh:
    """1-D mesh over all processes' devices (global view)."""
    return make_mesh(n_devices, axis_name=axis_name, devices=jax.devices())


def global_mesh_2d(pr: int | None = None, pc: int | None = None) -> Mesh:
    """("rowg", "colg") grid over all processes' devices.

    Default: Pr = process count, Pc = devices per process — jax.devices()
    orders all of process 0's devices first, so reshape(Pr, Pc) puts each
    host on its own grid ROW: the row-broadcasts (psum over "colg") stay
    intra-host and only the col-broadcasts cross DCN, which is the entire
    point of the layout (pchol2d module docstring; BASELINE.md round-4
    comm model)."""
    devs = jax.devices()
    if pr is None:
        pr = jax.process_count()
    if pc is None:
        pc = len(devs) // pr
    grid = np.asarray(devs[:pr * pc]).reshape(pr, pc)
    return Mesh(grid, (pchol2d.AXR, pchol2d.AXC))


def replicate(arr, mesh: Mesh):
    """Host-local array (same value on every process) -> global replicated
    jax.Array on `mesh`.  No-op in single-process jobs."""
    if not is_multiprocess():
        return jnp.asarray(arr)
    from jax.experimental import multihost_utils
    return multihost_utils.host_local_array_to_global_array(
        np.asarray(arr), mesh, P())


def pnll_vg(kernel: KernelSpec, hyp, x, y, mesh: Mesh, block: int | None = None):
    """Multi-host distributed (NLL, grad) — pgp.pnll_vg semantics.

    Every process must pass the SAME x/y/hyp (data-replicated input,
    matrix-sharded compute)."""
    n_dev = mesh.shape[pgp.AXIS]
    if block is None:
        from .pchol import auto_block
        block = auto_block(np.asarray(x).shape[0], n_dev)
    x_pad, y_pad, n = pgp._pad_xy(jnp.asarray(np.asarray(x)),
                                  jnp.asarray(np.asarray(y)), n_dev, block)
    hyp = replicate(np.asarray(hyp, np.asarray(x_pad).dtype), mesh)
    x_g = replicate(x_pad, mesh)
    y_g = replicate(y_pad, mesh)
    f, g = pgp._pnll_program(kernel, hyp, x_g, y_g, n, n_dev, block, mesh)
    return pgp.sanitize_value_and_grad(f, g)


def pfit(kernel: KernelSpec, noise_free: bool, x, y, vec0, lb, ub,
         mesh: Mesh, block: int | None = None, max_evals: int = 160):
    """Multi-host distributed bounded MLE fit — pgp.pfit semantics
    (pass standardized targets at float32; see pgp.pfit)."""
    n_dev = mesh.shape[pgp.AXIS]
    if block is None:
        from .pchol import auto_block
        block = auto_block(np.asarray(x).shape[0], n_dev)
    x_pad, y_pad, n = pgp._pad_xy(jnp.asarray(np.asarray(x)),
                                  jnp.asarray(np.asarray(y)), n_dev, block)
    dt = np.asarray(x_pad).dtype
    out = pgp._pfit_program(
        kernel, noise_free,
        replicate(np.asarray(vec0, dt), mesh),
        replicate(np.asarray(lb, dt), mesh),
        replicate(np.asarray(ub, dt), mesh),
        replicate(x_pad, mesh), replicate(y_pad, mesh),
        n, n_dev, block, max_evals, mesh)
    from ..optim.lbfgsb import LBFGSBResult
    return LBFGSBResult(*out)


def pfit_hosted(kernel: KernelSpec, noise_free: bool, x, y, vec0, lb, ub,
                mesh: Mesh, block: int | None = None,
                max_evals: int = 160):
    """Multi-host 1-D fit with the L-BFGS-B loop on the host — every
    process runs the identical deterministic loop on replicated values
    (the pfit2d pattern on the "rows" layout).  The pod-scale default:
    one collective program per evaluation, no monolithic 160-eval
    execution to trip a runtime watchdog."""
    from ..models.base import from_opt_vec
    from ..optim.lbfgsb import lbfgsb_hosted

    n_dev = mesh.shape[pgp.AXIS]
    if block is None:
        from .pchol import auto_block
        block = auto_block(np.asarray(x).shape[0], n_dev)
    x_pad, y_pad, n = pgp._pad_xy(jnp.asarray(np.asarray(x)),
                                  jnp.asarray(np.asarray(y)), n_dev, block)
    dt = np.asarray(x_pad).dtype
    x_g = replicate(x_pad, mesh)
    y_g = replicate(y_pad, mesh)

    def fun(v):
        hyp = replicate(np.asarray(from_opt_vec(jnp.asarray(v, dt),
                                                noise_free)), mesh)
        f, g = pgp._pnll_program(kernel, hyp, x_g, y_g, n, n_dev, block,
                                 mesh)
        gv = jnp.concatenate([g[:-2], g[-1:]]) if noise_free else g
        return pgp.sanitize_value_and_grad(f, gv)

    return lbfgsb_hosted(fun, jnp.asarray(np.asarray(vec0, dt)),
                         jnp.asarray(np.asarray(lb, dt)),
                         jnp.asarray(np.asarray(ub, dt)),
                         max_evals=max_evals, jit_fun=False)


def ppredict(kernel: KernelSpec, hyp, x, L, invKys, xs, mesh: Mesh,
             block: int | None = None):
    """Multi-host distributed batch posterior (pgp.ppredict semantics).
    `L` is the global sharded factor returned by this module's pset_k."""
    if block is None:
        block = int(L.shape[2])
    n_dev = mesh.shape[pgp.AXIS]
    x_arr = np.asarray(x)
    x_pad, _, n = pgp._pad_xy(jnp.asarray(x_arr),
                              jnp.zeros((x_arr.shape[0],), x_arr.dtype),
                              n_dev, block)
    dt = np.asarray(x_pad).dtype
    hyp = replicate(np.asarray(hyp, dt), mesh)
    xs_g = replicate(np.asarray(xs, dt), mesh)
    x_g = replicate(x_pad, mesh)
    return pgp._ppredict_program(kernel, hyp, x_g, L,
                                 replicate(np.asarray(invKys, dt), mesh),
                                 xs_g, n, n_dev, block, mesh)


def ppredict_with_grad(kernel: KernelSpec, hyp, x, L, invKys, xs,
                       mesh: Mesh, block: int | None = None):
    """Multi-host (y, gy, s2, gs2) off the sharded 1-D posterior — the BO
    acquisition path (pgp.ppredict_with_grad semantics).  Only the
    K^{-1} k* column solve is collective; the kernel-gradient algebra
    runs identically on every process from the replicated solve."""
    if block is None:
        block = int(L.shape[2])
    n_dev = mesh.shape[pgp.AXIS]
    x_arr = np.asarray(x)
    x_pad, _, n = pgp._pad_xy(jnp.asarray(x_arr),
                              jnp.zeros((x_arr.shape[0],), x_arr.dtype),
                              n_dev, block)
    dt = np.asarray(x_pad).dtype
    hyp_l = jnp.asarray(np.asarray(hyp, dt))
    xs_l = jnp.asarray(np.asarray(xs, dt))
    x_l = jnp.asarray(x_arr, dt)
    nc = kernel.num_hyp(x_arr.shape[1])
    chyp = hyp_l[:nc]

    kt = kernel.k(chyp, xs_l, x_l)                       # (T, N), local
    kt_pad = jnp.zeros((x_pad.shape[0], xs_l.shape[0]), dt
                       ).at[:n, :].set(kt.T)
    kks = np.asarray(pgp._psolve_columns(
        replicate(kt_pad, mesh), L, n_dev, block, mesh))[:n]

    from ..models.base import hyp_mean, hyp_sn2
    import jax

    invKys_l = jnp.asarray(np.asarray(invKys, dt))
    yfun = lambda xi: hyp_mean(hyp_l) + jnp.dot(
        kernel.k(chyp, xi[None, :], x_l)[0], invKys_l)
    yv, gy = jax.vmap(jax.value_and_grad(yfun))(xs_l)

    sf2 = kernel.diag_k(chyp, xs_l)
    kks_l = jnp.asarray(kks, dt)
    s2 = jnp.maximum(sf2 - jnp.einsum("tn,nt->t", kt, kks_l), 0.0) \
        + hyp_sn2(hyp_l)

    def gs2_one(xi, kks_t):
        _, vjp = jax.vjp(lambda z: kernel.k(chyp, z[None, :], x_l)[0], xi)
        return vjp(-2.0 * kks_t)[0]

    gs2 = jax.vmap(gs2_one)(xs_l, kks_l.T)
    return yv, gy, s2, gs2


def ppredict2d_with_grad(kernel: KernelSpec, hyp, x, L, invKys, xs,
                         mesh: Mesh, block: int | None = None):
    """Multi-host grid acquisition path (pchol2d.ppredict2d_with_grad
    semantics): the grid column solve is the only collective."""
    pr, pc = mesh.shape[pchol2d.AXR], mesh.shape[pchol2d.AXC]
    if block is None:
        block = int(L.shape[4])
    x_arr = np.asarray(x)
    x_pad, _, n = pchol2d._pad_xy(
        jnp.asarray(x_arr), jnp.zeros((x_arr.shape[0],), x_arr.dtype),
        pr, pc, block)
    dt = np.asarray(x_pad).dtype
    hyp_l = jnp.asarray(np.asarray(hyp, dt))
    xs_l = jnp.asarray(np.asarray(xs, dt))
    x_l = jnp.asarray(x_arr, dt)
    nc = kernel.num_hyp(x_arr.shape[1])
    chyp = hyp_l[:nc]

    kt = kernel.k(chyp, xs_l, x_l)
    kt_pad = jnp.zeros((x_pad.shape[0], xs_l.shape[0]), dt
                       ).at[:n, :].set(kt.T)
    kks = np.asarray(pchol2d._psolve2d_columns(
        replicate(kt_pad, mesh), L, pr, pc, mesh))[:n]

    from ..models.base import hyp_mean, hyp_sn2
    import jax

    invKys_l = jnp.asarray(np.asarray(invKys, dt))
    yfun = lambda xi: hyp_mean(hyp_l) + jnp.dot(
        kernel.k(chyp, xi[None, :], x_l)[0], invKys_l)
    yv, gy = jax.vmap(jax.value_and_grad(yfun))(xs_l)

    sf2 = kernel.diag_k(chyp, xs_l)
    kks_l = jnp.asarray(kks, dt)
    s2 = jnp.maximum(sf2 - jnp.einsum("tn,nt->t", kt, kks_l), 0.0) \
        + hyp_sn2(hyp_l)

    def gs2_one(xi, kks_t):
        _, vjp = jax.vjp(lambda z: kernel.k(chyp, z[None, :], x_l)[0], xi)
        return vjp(-2.0 * kks_t)[0]

    gs2 = jax.vmap(gs2_one)(xs_l, kks_l.T)
    return yv, gy, s2, gs2


def pset_k(kernel: KernelSpec, hyp, x, y, mesh: Mesh, block: int | None = None,
           max_tries: int = 32):
    """Multi-host posterior cache with the noise-inflation rescue
    (pgp.pset_k semantics).  Returns (hyp', L_sharded, invKys, ok)."""
    n_dev = mesh.shape[pgp.AXIS]
    if block is None:
        from .pchol import auto_block
        block = auto_block(np.asarray(x).shape[0], n_dev)
    x_pad, y_pad, n = pgp._pad_xy(jnp.asarray(np.asarray(x)),
                                  jnp.asarray(np.asarray(y)), n_dev, block)
    dt = np.asarray(x_pad).dtype
    hyp = np.asarray(hyp, dt)
    x_g = replicate(x_pad, mesh)
    y_g = replicate(y_pad, mesh)
    eps = float(np.finfo(dt).eps)

    log_sn = float(hyp[-2])
    ok = False
    for _ in range(max_tries):
        h = hyp.copy()
        h[-2] = log_sn
        L, ok_arr, invKys = pgp._pfactor_program(
            kernel, replicate(h, mesh), x_g, y_g, n, n_dev, block, mesh)
        ok = bool(np.asarray(ok_arr))
        if ok:
            break
        log_sn = (np.log(eps) if np.isinf(log_sn)
                  else log_sn + 0.5 * np.log(10.0))
    hyp = hyp.copy()
    hyp[-2] = log_sn
    return jnp.asarray(hyp), L, invKys[:n], ok


# --------------------------------------------------------------------------
# 2-D ("rowg", "colg") grid entries — the DCN-lean layout crossing real
# process boundaries (parallel/pchol2d; the layout exists FOR the host
# boundary, so these are its production entry points on a pod)
# --------------------------------------------------------------------------

def _pad_xy2d(x, y, pr: int, pc: int, block):
    from .pchol import auto_block
    if block is None:
        block = auto_block(np.asarray(x).shape[0], pr * pc)
    x_pad, y_pad, n = pchol2d._pad_xy(jnp.asarray(np.asarray(x)),
                                      jnp.asarray(np.asarray(y)), pr, pc,
                                      block)
    return x_pad, y_pad, n, block


def pnll_vg2d(kernel: KernelSpec, hyp, x, y, mesh: Mesh,
              block: int | None = None):
    """Multi-host grid (NLL, grad) — pchol2d.pnll_vg2d semantics.

    Every process must pass the SAME x/y/hyp (data-replicated input,
    grid-sharded compute)."""
    pr, pc = mesh.shape[pchol2d.AXR], mesh.shape[pchol2d.AXC]
    x_pad, y_pad, n, block = _pad_xy2d(x, y, pr, pc, block)
    dt = np.asarray(x_pad).dtype
    f, g = pchol2d._pnll_vg2d_program(
        kernel, replicate(np.asarray(hyp, dt), mesh),
        replicate(x_pad, mesh), replicate(y_pad, mesh), n, pr, pc, block,
        mesh)
    return pgp.sanitize_value_and_grad(f, g)


def pfit2d(kernel: KernelSpec, noise_free: bool, x, y, vec0, lb, ub,
           mesh: Mesh, block: int | None = None, max_evals: int = 160):
    """Multi-host grid bounded MLE fit, L-BFGS-B driven from the host —
    every process runs the identical deterministic host loop on
    replicated values, so they stay in lockstep and each evaluation is
    one collective grid program (the pchol2d.pfit2d_hosted pattern
    across process boundaries).  Pass standardized targets at float32."""
    from ..models.base import from_opt_vec
    from ..optim.lbfgsb import lbfgsb_hosted

    pr, pc = mesh.shape[pchol2d.AXR], mesh.shape[pchol2d.AXC]
    x_pad, y_pad, n, block = _pad_xy2d(x, y, pr, pc, block)
    dt = np.asarray(x_pad).dtype
    x_g = replicate(x_pad, mesh)
    y_g = replicate(y_pad, mesh)

    def fun(v):
        hyp = replicate(np.asarray(from_opt_vec(jnp.asarray(v, dt),
                                                noise_free)), mesh)
        f, g = pchol2d._pnll_vg2d_program(kernel, hyp, x_g, y_g, n, pr,
                                          pc, block, mesh)
        gv = jnp.concatenate([g[:-2], g[-1:]]) if noise_free else g
        return pgp.sanitize_value_and_grad(f, gv)

    return lbfgsb_hosted(fun, jnp.asarray(np.asarray(vec0, dt)),
                         jnp.asarray(np.asarray(lb, dt)),
                         jnp.asarray(np.asarray(ub, dt)),
                         max_evals=max_evals, jit_fun=False)


def pset_k2d(kernel: KernelSpec, hyp, x, y, mesh: Mesh,
             block: int | None = None, max_tries: int = 32):
    """Multi-host grid posterior cache with the noise-inflation rescue
    (pchol2d.pset_k2d semantics) — every rescue attempt is one grid
    program; the ladder never re-enters the 1-D all-gather layout.
    Returns (hyp', L grid-sharded, invKys, ok)."""
    pr, pc = mesh.shape[pchol2d.AXR], mesh.shape[pchol2d.AXC]
    x_pad, y_pad, n, block = _pad_xy2d(x, y, pr, pc, block)
    dt = np.asarray(x_pad).dtype
    hyp = np.asarray(hyp, dt)
    x_g = replicate(x_pad, mesh)
    y_g = replicate(y_pad, mesh)
    eps = float(np.finfo(dt).eps)

    log_sn = float(hyp[-2])
    ok = False
    for _ in range(max_tries):
        h = hyp.copy()
        h[-2] = log_sn
        L, ok_arr, invKys = pchol2d._pfactor2d_program(
            kernel, replicate(h, mesh), x_g, y_g, n, pr, pc, block, mesh)
        ok = bool(np.asarray(ok_arr))
        if ok:
            break
        log_sn = (np.log(eps) if np.isinf(log_sn)
                  else log_sn + 0.5 * np.log(10.0))
    hyp = hyp.copy()
    hyp[-2] = log_sn
    return jnp.asarray(hyp), L, invKys[:n], ok


def ppredict2d(kernel: KernelSpec, hyp, x, L, invKys, xs, mesh: Mesh,
               block: int | None = None):
    """Multi-host grid batch posterior (pchol2d.ppredict2d semantics).
    `L` is the global grid-sharded factor from this module's pset_k2d."""
    pr, pc = mesh.shape[pchol2d.AXR], mesh.shape[pchol2d.AXC]
    if block is None:
        block = int(L.shape[4])
    x_arr = np.asarray(x)
    x_pad, _, n = pchol2d._pad_xy(
        jnp.asarray(x_arr), jnp.zeros((x_arr.shape[0],), x_arr.dtype),
        pr, pc, block)
    dt = np.asarray(x_pad).dtype
    return pchol2d._ppredict2d_program(
        kernel, replicate(np.asarray(hyp, dt), mesh),
        replicate(x_pad, mesh), L,
        replicate(np.asarray(invKys, dt), mesh),
        replicate(np.asarray(xs, dt), mesh), n, pr, pc, block, mesh)
