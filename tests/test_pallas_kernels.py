"""Fused Pallas SE kernels vs the XLA formulas (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gp_tpu.ops.pallas_kernels as pk
from gp_tpu import get_kernel, SE_ARD, SE_ISO
from gp_tpu.ops.sdist import sqdist


@pytest.fixture(autouse=True)
def force_pallas_path(monkeypatch):
    """Small test sizes must still exercise the Pallas (interpret) path."""
    monkeypatch.setattr(pk, "_MIN_ROWS", 1)


def _ref_k(inv_l, sf2, x1, x2):
    return sf2 * jnp.exp(-0.5 * sqdist(x1 * inv_l, x2 * inv_l))


@pytest.mark.parametrize("m,n,d", [(70, 130, 5), (8, 8, 1), (257, 64, 24)])
def test_se_matrix_matches_xla(m, n, d):
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.standard_normal((m, d)))
    x2 = jnp.asarray(rng.standard_normal((n, d)))
    inv_l = jnp.asarray(np.exp(rng.uniform(-1, 1, d)))
    K = pk.se_matrix(inv_l, 2.5, x1, x2, interpret=True)
    K_ref = _ref_k(inv_l, 2.5, x1, x2)
    np.testing.assert_allclose(np.asarray(K), np.asarray(K_ref),
                               rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("which", ["ard", "iso"])
def test_custom_vjp_matches_autodiff(which):
    rng = np.random.default_rng(1)
    m, n, d = 20, 15, 4
    x1 = jnp.asarray(rng.standard_normal((m, d)))
    x2 = jnp.asarray(rng.standard_normal((n, d)))
    W = jnp.asarray(rng.standard_normal((m, n)))

    if which == "ard":
        chyp = jnp.asarray(rng.uniform(-1, 1, d + 1))
        f_pallas = lambda c, a, b: jnp.sum(W * pk.seard_k_pallas(c, a, b))
        f_ref = lambda c, a, b: jnp.sum(W * SE_ARD.k(c, a, b))
    else:
        chyp = jnp.asarray(rng.uniform(-1, 1, 2))
        f_pallas = lambda c, a, b: jnp.sum(W * pk.seiso_k_pallas(c, a, b))
        f_ref = lambda c, a, b: jnp.sum(W * SE_ISO.k(c, a, b))

    g = jax.grad(f_pallas, argnums=(0, 1, 2))(chyp, x1, x2)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(chyp, x1, x2)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-9)


def test_registered_variants():
    k = get_kernel("se_ard_pallas")
    assert k.num_hyp(7) == 8
    k2 = get_kernel("se_iso_pallas")
    assert k2.num_hyp(7) == 2


def test_gp_trains_with_pallas_kernel(toy_problem):
    """End-to-end: model fit through the custom-vjp Pallas covariance equals
    the stock XLA covariance fit."""
    from gp_tpu import GP
    X, y, Xs, _ = toy_problem
    g1 = GP(X, y, kernel="se_ard")
    g2 = GP(X, y, kernel="se_ard_pallas")
    n1, n2 = g1.train(), g2.train()
    np.testing.assert_allclose(n1, n2, rtol=1e-7)
    mu1, s21 = g1.batch_predict(Xs)
    mu2, s22 = g2.batch_predict(Xs)
    np.testing.assert_allclose(mu1, mu2, rtol=1e-6)
    np.testing.assert_allclose(s21, s22, rtol=1e-5, atol=1e-9)
    # input-gradient path (vmapped per-point custom-vjp)
    y1, gy1 = g1.batch_predict_y_with_grad(Xs[:3])
    y2, gy2 = g2.batch_predict_y_with_grad(Xs[:3])
    np.testing.assert_allclose(gy1, gy2, rtol=1e-5, atol=1e-8)


class TestKNoiseFused:
    """Fused symmetric noise build (KernelSpec.k_noise): values and the
    custom-VJP correction algebra vs the generic build + plain autodiff."""

    def _setup(self, n=40, d=3, seed=0):
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.standard_normal((n, d)))
        chyp = jnp.asarray(np.concatenate([
            rng.uniform(-0.3, 0.5, d), [0.2]]))
        return x, chyp

    def test_values_match_generic(self):
        from gp_tpu.ops.kernels import KERNELS, get_k_noise
        x, chyp = self._setup()
        sn2 = jnp.asarray(0.07)
        K_fused = get_k_noise(KERNELS["se_ard"])(chyp, sn2, x, x.shape[0])
        K_gen = get_k_noise(KERNELS["se_ard_xla"])(chyp, sn2, x, x.shape[0])
        np.testing.assert_allclose(np.asarray(K_fused), np.asarray(K_gen),
                                   rtol=1e-12, atol=1e-12)

    @pytest.mark.parametrize("name", ["se_ard", "se_iso"])
    def test_vjp_matches_autodiff(self, name):
        """The corrected cotangent algebra (g_logsf -= 2 sn2 tr(G);
        g_sn2 = tr_real(G)) vs plain AD through the generic build, with a
        symmetric cotangent."""
        from gp_tpu.ops.kernels import KERNELS, get_k_noise
        x, chyp = self._setup(seed=1)
        if name == "se_iso":
            chyp = chyp[-2:]
        n = x.shape[0]
        sn2 = jnp.asarray(0.11)
        rng = np.random.default_rng(2)
        G0 = rng.standard_normal((n, n))
        G = jnp.asarray(G0 + G0.T)

        def scalar(kn):
            def f(c, s2):
                return jnp.sum(kn(c, s2, x, n) * G)
            return f

        kn_f = get_k_noise(KERNELS[name])
        kn_g = get_k_noise(KERNELS[name + "_xla"])
        gc_f, gs_f = jax.grad(scalar(kn_f), argnums=(0, 1))(chyp, sn2)
        gc_g, gs_g = jax.grad(scalar(kn_g), argnums=(0, 1))(chyp, sn2)
        np.testing.assert_allclose(np.asarray(gc_f), np.asarray(gc_g),
                                   rtol=1e-9, atol=1e-10)
        np.testing.assert_allclose(float(gs_f), float(gs_g), rtol=1e-10)

    def test_vjp_with_decoys(self):
        """n_real < n: decoy diag = sf2, zero decoy-diag cotangent, and
        the sn2 gradient only counts real diagonal entries."""
        from gp_tpu.ops.kernels import KERNELS, get_k_noise
        x, chyp = self._setup(seed=3)
        n, n_real = x.shape[0], 30
        sn2 = jnp.asarray(0.05)
        sf2 = float(jnp.exp(2.0 * chyp[-1]))
        kn_f = get_k_noise(KERNELS["se_ard"])
        kn_g = get_k_noise(KERNELS["se_ard_xla"])
        K = kn_f(chyp, sn2, x, n_real)
        d = np.diag(np.asarray(K))
        np.testing.assert_allclose(d[n_real:], sf2, rtol=1e-12)
        np.testing.assert_allclose(d[:n_real], sf2 + float(sn2), rtol=1e-12)

        rng = np.random.default_rng(4)
        G0 = rng.standard_normal((n, n))
        G0 = G0 + G0.T
        ids = np.arange(n)
        G0[ids[n_real:], ids[n_real:]] = 0.0       # cotangent contract
        G = jnp.asarray(G0)

        def scalar(kn):
            return lambda c, s2: jnp.sum(kn(c, s2, x, n_real) * G)

        gc_f, gs_f = jax.grad(scalar(kn_f), argnums=(0, 1))(chyp, sn2)
        gc_g, gs_g = jax.grad(scalar(kn_g), argnums=(0, 1))(chyp, sn2)
        np.testing.assert_allclose(np.asarray(gc_f), np.asarray(gc_g),
                                   rtol=1e-9, atol=1e-10)
        np.testing.assert_allclose(float(gs_f), float(gs_g), rtol=1e-10)


def test_se_matrix_diag_interpret_matches_generic():
    """The fused diag-overwrite kernel itself (interpret mode — the real
    pallas_call arity/specs, which the XLA fallback cannot cover)."""
    from gp_tpu.ops import pallas_kernels as pk

    rng = np.random.default_rng(11)
    n, d = 140, 3
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    inv_l = jnp.asarray(np.exp(rng.uniform(-0.3, 0.3, d)), jnp.float32)
    sf2, sn2 = 1.7, 0.09
    dvals = jnp.full((n,), sf2 + sn2, jnp.float32)
    K = pk.se_matrix_diag(inv_l, sf2, x, dvals, tile=128, interpret=True)
    from gp_tpu.ops.sdist import sqdist
    K_ref = np.array(sf2 * jnp.exp(-0.5 * sqdist(x * inv_l, x * inv_l)))
    ids = np.arange(n)
    K_ref[ids, ids] = sf2 + sn2
    np.testing.assert_allclose(np.asarray(K), K_ref, rtol=1e-5, atol=1e-6)
