"""Additional stationary covariance families (beyond the reference's SE).

The reference ships only CovSEard/CovSEiso (GP.cpp:575-587 factory).  These
extend the same KernelSpec contract — identical hyp packing conventions
([log lengthscales..., log sigma_f (+ extras)]), the same span-derived
lengthscale boxes, autodiff-supplied derivatives — so every model (exact /
FITC / VFE / Bucketed / distributed) works with them unchanged:

  matern52[_iso]   k = sf^2 (1 + a r + a^2 r^2 / 3) exp(-a r),  a = sqrt(5)
  matern32[_iso]   k = sf^2 (1 + a r) exp(-a r),                a = sqrt(3)
  rq[_iso]         k = sf^2 (1 + d^2 / (2 alpha)) ^ (-alpha)
                   (scaled distances; extra hyp: log alpha, appended last)

Differentiability note: r = sqrt(d^2) is not differentiable at r = 0, so
the Matern kernels use a tiny-floor sqrt — the true derivative at
coincident points is 0, and the floor keeps autodiff finite there.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .kernels import (KernelSpec, KERNELS, _seard_default_hyp,
                      _seard_hyp_range, _seiso_default_hyp,
                      _seiso_hyp_range)
from .sdist import sqdist

_R_FLOOR = 1e-32


def _scaled_d2(inv_l, x1, x2):
    return sqdist(x1 * inv_l, x2 * inv_l)


def _safe_r(d2):
    return jnp.sqrt(d2 + _R_FLOOR)


def _matern_k(nu_c: float):
    """nu_c = sqrt(3) (Matern-3/2) or sqrt(5) (Matern-5/2)."""
    five_half = abs(nu_c ** 2 - 5.0) < 1e-12
    # weak-typed Python float, NOT a numpy f64 scalar: with x64 enabled
    # (the library default) a numpy scalar is strong-typed and silently
    # promotes the entire covariance to f64 — measured 1126 ms (emulated
    # f64 Cholesky) vs ~25 ms for the f32 NLL at N=8000 on v5e (round 5)
    nu_c = float(nu_c)

    def k_from(inv_l, sf2, x1, x2):
        r = _safe_r(_scaled_d2(inv_l, x1, x2))
        ar = nu_c * r
        poly = 1.0 + ar + (ar * ar / 3.0 if five_half else 0.0)
        return sf2 * poly * jnp.exp(-ar)

    return k_from


def _ard(k_from):
    def k(chyp, x1, x2):
        d = x1.shape[-1]
        return k_from(jnp.exp(-chyp[:d]), jnp.exp(2.0 * chyp[d]), x1, x2)
    return k


def _iso(k_from):
    def k(chyp, x1, x2):
        return k_from(jnp.exp(-chyp[0]), jnp.exp(2.0 * chyp[1]), x1, x2)
    return k


def _diag_ard(chyp, x):
    d = x.shape[-1]
    return jnp.full((x.shape[0],), jnp.exp(2.0 * chyp[d]), dtype=x.dtype)


def _diag_iso(chyp, x):
    return jnp.full((x.shape[0],), jnp.exp(2.0 * chyp[1]), dtype=x.dtype)


def _make_stationary(name, k_from, form=None):
    """form != None: Matern family — fused Pallas forward + closed-form
    backward (pallas_kernels.matern_k_pallas), the fused K+noise-diag
    build (k_noise), and far-pad eligibility (exponential decay: decoy
    cross-covariances underflow to exact zero like the SE family —
    exp(-sqrt(3)*141) = e^-244 << the f32 exp cutoff ~-103).  Measured
    round 5: the jnp build + generic vjp ran 29.4 NLL+grad evals/s at
    N=8000 vs SE's ~42 — the gap was exactly the SE-only KernelSpec
    extras this closes."""
    if form is not None:
        from .pallas_kernels import matern_k_noise_pallas, matern_k_pallas
        k_ard, k_iso = matern_k_pallas(form, True), matern_k_pallas(form,
                                                                    False)
        kn_ard = matern_k_noise_pallas(form, True)
        kn_iso = matern_k_noise_pallas(form, False)
    else:
        k_ard, k_iso = _ard(k_from), _iso(k_from)
        kn_ard = kn_iso = None
    ard = KernelSpec(
        name=name,
        num_hyp=lambda dim: dim + 1,
        k=k_ard,
        diag_k=_diag_ard,
        default_hyp=_seard_default_hyp,
        hyp_range=_seard_hyp_range,
        k_noise=kn_ard,
        far_pad_ok=form is not None,
    )
    iso = KernelSpec(
        name=f"{name}_iso",
        num_hyp=lambda dim: 2,
        k=k_iso,
        diag_k=_diag_iso,
        default_hyp=_seiso_default_hyp,
        hyp_range=_seiso_hyp_range,
        k_noise=kn_iso,
        far_pad_ok=form is not None,
    )
    return ard, iso


MATERN52, MATERN52_ISO = _make_stationary("matern52",
                                          _matern_k(np.sqrt(5.0)),
                                          form="m52")
MATERN32, MATERN32_ISO = _make_stationary("matern32",
                                          _matern_k(np.sqrt(3.0)),
                                          form="m32")


# -- Rational Quadratic: extra log-alpha hyp appended after log sigma_f ----

def _rq_k_ard(chyp, x1, x2):
    d = x1.shape[-1]
    inv_l = jnp.exp(-chyp[:d])
    sf2 = jnp.exp(2.0 * chyp[d])
    alpha = jnp.exp(chyp[d + 1])
    d2 = _scaled_d2(inv_l, x1, x2)
    return sf2 * jnp.power(1.0 + d2 / (2.0 * alpha), -alpha)


def _rq_k_iso(chyp, x1, x2):
    inv_l = jnp.exp(-chyp[0])
    sf2 = jnp.exp(2.0 * chyp[1])
    alpha = jnp.exp(chyp[2])
    d2 = _scaled_d2(inv_l, x1, x2)
    return sf2 * jnp.power(1.0 + d2 / (2.0 * alpha), -alpha)


def _rq_default_ard(x, y):
    return np.concatenate([_seard_default_hyp(x, y), [0.0]])   # log alpha=0


def _rq_default_iso(x, y):
    return np.concatenate([_seiso_default_hyp(x, y), [0.0]])


_LOG_ALPHA_BOX = (np.log(1e-3), np.log(1e3))


def _rq_range_ard(x, y):
    lb, ub = _seard_hyp_range(x, y)
    return (np.concatenate([lb, [_LOG_ALPHA_BOX[0]]]),
            np.concatenate([ub, [_LOG_ALPHA_BOX[1]]]))


def _rq_range_iso(x, y):
    lb, ub = _seiso_hyp_range(x, y)
    return (np.concatenate([lb, [_LOG_ALPHA_BOX[0]]]),
            np.concatenate([ub, [_LOG_ALPHA_BOX[1]]]))


def _rq_diag_ard(chyp, x):
    d = x.shape[-1]
    return jnp.full((x.shape[0],), jnp.exp(2.0 * chyp[d]), dtype=x.dtype)


def _rq_diag_iso(chyp, x):
    return jnp.full((x.shape[0],), jnp.exp(2.0 * chyp[1]), dtype=x.dtype)


def _rq_pallas():
    from .pallas_kernels import rq_k_noise_pallas, rq_k_pallas
    return (rq_k_pallas(True), rq_k_pallas(False),
            rq_k_noise_pallas(True), rq_k_noise_pallas(False))


_RQ_K_ARD, _RQ_K_ISO, _RQ_KN_ARD, _RQ_KN_ISO = _rq_pallas()

RQ = KernelSpec(
    name="rq",
    num_hyp=lambda dim: dim + 2,
    k=_RQ_K_ARD,               # fused Pallas forward + closed-form vjp
    diag_k=_rq_diag_ard,
    default_hyp=_rq_default_ard,
    hyp_range=_rq_range_ard,
    out_scale_idx=-2,          # log sigma_f sits before log alpha
    k_noise=_RQ_KN_ARD,
)

RQ_ISO = KernelSpec(
    name="rq_iso",
    num_hyp=lambda dim: 3,
    k=_RQ_K_ISO,
    diag_k=_rq_diag_iso,
    default_hyp=_rq_default_iso,
    hyp_range=_rq_range_iso,
    out_scale_idx=-2,
    k_noise=_RQ_KN_ISO,
)


for spec in (MATERN52, MATERN52_ISO, MATERN32, MATERN32_ISO, RQ, RQ_ISO):
    KERNELS[spec.name] = spec
