"""Exact-GP tests: NLL/gradient/prediction parity against independent NumPy
float64 computations of the reference formulas (GP.cpp), plus training
behavior (noise-free mode, fixhyps, add_data, INF rescue)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

from gp_tpu import GP
from gp_tpu.models import exact
from gp_tpu.models.base import default_hyps, from_opt_vec, hyp_range, to_opt_vec
from gp_tpu.ops.kernels import SE_ARD, SE_ISO


# ---------------------------------------------------------------------------
# Independent NumPy golden implementations (kept deliberately naive)
# ---------------------------------------------------------------------------

def np_seard_k(chyp, x1, x2):
    d = x1.shape[1]
    ell = np.exp(chyp[:d])
    sf2 = np.exp(2 * chyp[d])
    diff = (x1[:, None, :] - x2[None, :, :]) / ell
    return sf2 * np.exp(-0.5 * np.sum(diff**2, axis=-1))


def np_nll(hyp, x, y):
    """GP::_calcNegLogProb golden (GP.cpp:120-148)."""
    n, d = x.shape
    sn2 = np.exp(2 * hyp[-2])
    mean = hyp[-1]
    K = np_seard_k(hyp[:-2], x, x) + sn2 * np.eye(n)
    r = y - mean
    alpha = np.linalg.solve(K, r)
    sign, logdet = np.linalg.slogdet(K)
    return 0.5 * r @ alpha + 0.5 * logdet + 0.5 * n * np.log(2 * np.pi)


def np_predict(hyp, x, y, xs):
    """GP::_predict golden (GP.cpp:273-283)."""
    n = x.shape[0]
    sn2 = np.exp(2 * hyp[-2])
    mean = hyp[-1]
    sf2 = np.exp(2 * hyp[-3])
    K = np_seard_k(hyp[:-2], x, x) + sn2 * np.eye(n)
    kt = np_seard_k(hyp[:-2], xs, x)
    invKys = np.linalg.solve(K, y - mean)
    mu = mean + kt @ invKys
    kks = np.linalg.solve(K, kt.T)
    s2 = np.maximum(sf2 - np.sum(kt * kks.T, axis=1), 0.0) + sn2
    return mu, s2


@pytest.fixture(scope="module")
def hyp_toy():
    return np.array([0.4, 0.1, -0.3, 0.2, -2.0, 0.05])  # d=3 SEard + noise + mean


def test_nll_matches_numpy(toy_problem, hyp_toy):
    X, y, _, _ = toy_problem
    ours = float(exact.nll(SE_ARD, jnp.asarray(hyp_toy), jnp.asarray(X),
                           jnp.asarray(y)))
    assert ours == pytest.approx(np_nll(hyp_toy, X, y), rel=1e-10)


def test_nll_gradient_finite_differences(toy_problem, hyp_toy):
    """Analog of GP::_likelihood_gradient_checking (GP.cpp:486-507)."""
    X, y, _, _ = toy_problem
    f = lambda h: exact.nll_raw(SE_ARD, h, jnp.asarray(X), jnp.asarray(y))
    check_grads(f, (jnp.asarray(hyp_toy),), order=1, modes=("rev",),
                rtol=1e-6, atol=1e-8)


def test_analytic_gradient_matches_ad(toy_problem, hyp_toy):
    """nll_vg_raw (explicit-inverse analytic gradient, GP.cpp:151-171) and
    nll_vg_streamed (tile-streamed variant for HBM-bound N) both agree with
    reverse-mode AD of the same objective."""
    import jax

    X, y, _, _ = toy_problem
    x_d, y_d = jnp.asarray(X), jnp.asarray(y)
    h = jnp.asarray(hyp_toy)
    f_ad, g_ad = jax.value_and_grad(
        lambda v: exact.nll_raw(SE_ARD, v, x_d, y_d))(h)
    for fn in (exact.nll_vg_raw,
               lambda *a: exact.nll_vg_streamed(*a, tile=13),
               # tile | n -> the lax.scan body + tiled one-carry K build
               lambda *a: exact.nll_vg_streamed(*a, tile=15)):
        f_an, g_an = fn(SE_ARD, h, x_d, y_d)
        np.testing.assert_allclose(float(f_an), float(f_ad), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(g_an), np.asarray(g_ad),
                                   rtol=1e-9, atol=1e-11)


def test_nll_inf_for_non_spd(toy_problem):
    X, y, _, _ = toy_problem
    # absurd hyp: sf enormous, noise 0 -> numerically singular
    bad = np.array([30.0, 30.0, 30.0, 40.0, -np.inf, 0.0])
    v = float(exact.nll(SE_ARD, jnp.asarray(bad), jnp.asarray(X), jnp.asarray(y)))
    assert np.isinf(v)
    # objective_vg sanitizes to (inf, 0)
    fv, g = exact.objective_vg(SE_ARD, False, jnp.asarray(bad), jnp.asarray(X),
                               jnp.asarray(y))
    assert np.isinf(float(fv))
    assert np.all(np.asarray(g) == 0)


def test_default_hyps_match_reference_formulas(toy_problem):
    X, y, _, _ = toy_problem
    hyp = default_hyps(SE_ARD, X, y, noise_lb=1e-3, noise_free=False)
    np.testing.assert_allclose(hyp[:3], np.log(np.std(X, axis=0, ddof=1)))
    assert hyp[3] == pytest.approx(np.log(np.std(y, ddof=1)))
    assert hyp[4] == pytest.approx(
        max(np.log(1e-3), np.log(np.std(y, ddof=1) * 1e-3)))
    assert hyp[5] == pytest.approx(y.mean())
    # noise-free pins log sigma_n at -inf (GP.cpp:89)
    hyp_nf = default_hyps(SE_ARD, X, y, noise_lb=0.0, noise_free=True)
    assert hyp_nf[4] == -np.inf


def test_hyp_range_noise_and_mean_rows(toy_problem):
    X, y, _, _ = toy_problem
    lb, ub = hyp_range(SE_ARD, X, y, noise_lb=1e-3)
    assert lb[4] == pytest.approx(np.log(1e-3), rel=1e-9)
    cov_lb, cov_ub = SE_ARD.hyp_range(X, y)
    assert ub[4] == pytest.approx(max(np.log(1e-2), cov_ub[-1]), rel=1e-9)
    assert lb[5] <= y.min() and ub[5] >= y.max()


def test_opt_vec_packing():
    hyp = jnp.array([1.0, 2.0, 3.0, -5.0, 0.7])
    v = to_opt_vec(hyp, True)
    assert v.shape == (4,)
    np.testing.assert_allclose(np.asarray(v), [1.0, 2.0, 3.0, 0.7])
    h = from_opt_vec(v, True)
    np.testing.assert_allclose(np.asarray(h[:3]), [1.0, 2.0, 3.0])
    assert np.isneginf(float(h[3]))
    assert float(h[4]) == 0.7
    # identity when noise is optimized
    np.testing.assert_allclose(np.asarray(from_opt_vec(hyp, False)),
                               np.asarray(hyp))


def test_train_matches_scipy(toy_problem):
    """End-to-end MLE: our jitted L-BFGS-B must reach the same optimum as
    scipy L-BFGS-B on the identical objective (NLOPT-SLSQP stand-in)."""
    from scipy.optimize import minimize

    X, y, _, _ = toy_problem
    gp = GP(X, y)
    nlz = gp.train()

    lb, ub = gp.hyp_bounds()
    vec0 = np.clip(gp.get_default_hyps(), lb, ub)

    def fg(v):
        f, g = exact.objective_vg(SE_ARD, False, jnp.asarray(v), gp._x, gp._y)
        return float(f), np.asarray(g)

    sp = minimize(fg, vec0, jac=True, method="L-BFGS-B",
                  bounds=list(zip(lb, ub)), options={"maxiter": 300})
    assert nlz == pytest.approx(sp.fun, abs=1e-4)
    assert gp.trained


def test_predict_matches_numpy(toy_problem):
    X, y, Xs, _ = toy_problem
    gp = GP(X, y)
    gp.train()
    hyp = gp.get_hyp()
    mu, s2 = gp.batch_predict(Xs)
    mu_np, s2_np = np_predict(hyp, X, y, Xs)
    np.testing.assert_allclose(mu, mu_np, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(s2, s2_np, rtol=1e-6, atol=1e-10)
    # split fast paths agree with the combined one
    np.testing.assert_allclose(gp.batch_predict_y(Xs), mu, rtol=1e-12)
    np.testing.assert_allclose(gp.batch_predict_s2(Xs), s2, rtol=1e-12)


def test_predict_gradients_finite_differences(toy_problem):
    X, y, Xs, _ = toy_problem
    gp = GP(X, y)
    gp.train()
    xs = Xs[0]
    eps = 1e-6
    _, gy = gp.predict_y_with_grad(xs)
    _, gs2 = gp.predict_s2_with_grad(xs)
    for i in range(3):
        e = np.zeros(3); e[i] = eps
        fd_y = (gp.predict_y(xs + e) - gp.predict_y(xs - e)) / (2 * eps)
        fd_s2 = (gp.predict_s2(xs + e) - gp.predict_s2(xs - e)) / (2 * eps)
        assert gy[i] == pytest.approx(fd_y, rel=1e-4, abs=1e-7)
        assert gs2[i] == pytest.approx(fd_s2, rel=1e-4, abs=1e-7)


def test_predict_quality(toy_problem):
    """The fit actually explains the toy function."""
    X, y, Xs, fs = toy_problem
    gp = GP(X, y)
    gp.train()
    mu, s2 = gp.batch_predict(Xs)
    rmse = np.sqrt(np.mean((mu - fs) ** 2))
    assert rmse < 0.15
    assert (s2 > 0).all()


def test_fixhyps(toy_problem):
    X, y, _, _ = toy_problem
    gp = GP(X, y)
    gp.set_fixed(True)
    hyp0 = gp.get_default_hyps()
    nlz = gp.train(hyp0)
    # hyps unchanged by training (GP.cpp:200-206)
    np.testing.assert_allclose(gp.get_hyp(), hyp0, rtol=1e-12)
    assert np.isfinite(nlz)


def test_noise_free_mode(toy_problem):
    X, y, _, _ = toy_problem
    gp = GP(X, y)
    gp.set_noise_free(True)
    nlz = gp.train()
    hyp = gp.get_hyp()
    assert np.isfinite(nlz)
    # trained sn stays at -inf unless _setK had to inflate (interpolation => tiny s2)
    mu = gp.batch_predict_y(X[:5])
    np.testing.assert_allclose(mu, y[:5], atol=1e-3)


def test_add_data_invalidates(toy_problem):
    X, y, _, _ = toy_problem
    gp = GP(X[:40], y[:40])
    gp.train()
    assert gp.trained
    gp.add_data(X[40:], y[40:])
    assert not gp.trained
    assert gp.num_train == 60
    gp.train()
    assert gp.trained


def test_train_from_infinite_start_uses_multistart(toy_problem):
    """GP.cpp:196-198: infinite starting NLL triggers select_init_hyp."""
    X, y, _, _ = toy_problem
    gp = GP(X, y)
    bad = gp.get_default_hyps()
    bad[:3] = -40.0  # absurdly small length scales -> singular K...
    bad[-2] = -40.0  # and zero noise
    nlz = gp.train(bad)
    assert np.isfinite(nlz)


def test_seiso_end_to_end(toy_problem):
    X, y, Xs, fs = toy_problem
    gp = GP(X, y, kernel="se_iso")
    nlz = gp.train()
    assert np.isfinite(nlz)
    assert gp.num_hyp == 4
    mu = gp.batch_predict_y(Xs)
    rmse = np.sqrt(np.mean((mu - fs) ** 2))
    assert rmse < 0.4


def test_reference_data_subset(ref_data_small):
    """Trainability + sane posterior on the bundled dataset's head."""
    X, y, Xs, ys = ref_data_small
    gp = GP(X, y)
    nlz = gp.train()
    assert np.isfinite(nlz)
    mu, s2 = gp.batch_predict(Xs)
    assert np.isfinite(mu).all() and (s2 > 0).all()
    # beats predicting the mean
    base = np.sqrt(np.mean((y.mean() - ys) ** 2))
    rmse = np.sqrt(np.mean((mu - ys) ** 2))
    assert rmse < base


def test_seed_determinism(toy_problem):
    """DEBUG_RAND_SEED analog (def.cpp:10-16): same seed => identical
    multi-start results; different seeds may differ."""
    X, y, _, _ = toy_problem
    from gp_tpu import GP
    a = GP(X, y, seed=7)
    b = GP(X, y, seed=7)
    na = a.train_multistart(n_starts=4)
    nb = b.train_multistart(n_starts=4)
    assert na == nb
    np.testing.assert_array_equal(a.get_hyp(), b.get_hyp())


def test_set_k_streamed_matches_set_k():
    """set_k_streamed (factor-as-temp posterior for HBM-bound N) matches
    set_k when no rescue fires; when the factorization fails it must reach
    an SPD posterior at NO MORE noise than set_k's x-sqrt(10) ladder
    (GP.cpp:431-440) — the additive conditioning-floor schedule is the
    deliberately gentler replacement (round-3 post-mortem: the ladder
    destroyed a -39k-NLL N=51200 fit into a +226k noise-only model)."""
    rng = np.random.default_rng(1)
    n, d = 96, 4
    X = np.repeat(rng.standard_normal((n // 2, d)), 2, axis=0)  # singular
    y = rng.standard_normal(n)
    from gp_tpu.models.base import default_hyps
    hyp = jnp.asarray(default_hyps(SE_ARD, X, y, 1e-3, False))
    Xj, yj = jnp.asarray(X), jnp.asarray(y)

    # no-rescue case: exact agreement (same hyps; the refined invKys is
    # strictly more accurate, so compare against a direct dense solve)
    h0, f0, iv0, _ = exact.set_k(SE_ARD, hyp, Xj, yj)
    h1, aux, iv1 = exact.set_k_streamed(SE_ARD, hyp, Xj, yj, tile=32)
    np.testing.assert_allclose(np.asarray(h0), np.asarray(h1), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(iv0), np.asarray(iv1), rtol=1e-6)
    assert np.isfinite(aux["logdet"]) and np.isfinite(aux["nll_refined"])
    np.testing.assert_allclose(
        aux["nll_refined"], float(exact.nll(SE_ARD, h1, Xj, yj)), rtol=1e-9)

    # forced rescue on the singular Kcov: SPD reached within the additive
    # conditioning-floor envelope (sn2 <= sn2_0 + 2^7 floor), never the
    # ladder's unbounded x-sqrt(10) overshoot
    h_bad = hyp.at[-2].set(jnp.log(1e-12))
    h1, aux, iv1 = exact.set_k_streamed(SE_ARD, h_bad, Xj, yj, tile=32)
    assert np.all(np.isfinite(np.asarray(iv1)))
    assert np.isfinite(aux["nll_refined"])
    sf2_mean = float(np.exp(2 * float(hyp[-3])))
    floor = n * float(jnp.finfo(Xj.dtype).eps) * sf2_mean
    assert float(jnp.exp(2 * h1[-2])) <= 1e-24 + 2.0 ** 7 * floor
    np.testing.assert_allclose(np.asarray(h_bad[:-2]), np.asarray(h1[:-2]),
                               rtol=1e-12)


def test_train_chunked_stream_path_matches_default(toy_problem, monkeypatch):
    """Force the HBM-scale routing (streamed objective + chunked L-BFGS +
    host-loop set_k) on a toy problem: the fit must agree with the default
    in-jit pipeline."""
    from gp_tpu.models import exact as exact_mod

    X, y, _, _ = toy_problem
    a = GP(X, y)
    nll_a = a.train()
    monkeypatch.setattr(exact_mod, "_STREAM_MIN_N", 1)
    b = GP(X, y)
    nll_b = b.train()
    np.testing.assert_allclose(nll_b, nll_a, rtol=5e-6)
    np.testing.assert_allclose(np.asarray(b.get_hyp()),
                               np.asarray(a.get_hyp()), rtol=1e-4, atol=1e-6)


def test_far_padded_objective_matches_plain():
    """_nll_vg_far_padded (decoy-row capacity path) == nll_vg_raw exactly
    up to f64 roundoff, for both SE kernels and non-multiple sizes."""
    from gp_tpu import SE_ARD, SE_ISO
    from gp_tpu.models import exact
    from gp_tpu.models.base import default_hyps

    rng = np.random.default_rng(3)
    X = rng.standard_normal((100, 5)) * np.asarray([1.0, 10.0, 0.1, 3.0, 1.0])
    y = np.sin(X[:, 0]) + 0.1 * rng.standard_normal(100)
    for kernel in (SE_ARD, SE_ISO):
        hyp = jnp.asarray(default_hyps(kernel, X, y, 1e-3, False))
        hyp = hyp.at[-2].set(np.log(0.05))
        x_d, y_d = jnp.asarray(X), jnp.asarray(y)
        f0, g0 = exact.nll_vg_raw(kernel, hyp, x_d, y_d)
        for blk in (64, 128):
            f1, g1 = exact._nll_vg_far_padded(kernel, hyp, x_d, y_d, blk)
            np.testing.assert_allclose(float(f1), float(f0), rtol=1e-12)
            np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                                       rtol=1e-9, atol=1e-11)


def test_subset_init_hyps_warm_start():
    """subset_init_hyps fits a random subset and train(init) accepts it."""
    from gp_tpu import GP

    rng = np.random.default_rng(5)
    X = rng.uniform(-3, 3, (300, 2))
    y = np.sin(X[:, 0]) * np.cos(X[:, 1]) + 0.05 * rng.standard_normal(300)
    gp = GP(X, y)
    init = gp.subset_init_hyps(m=128, seed=1)
    assert np.all(np.isfinite(init)) and init.shape == (gp.num_hyp,)
    nll = gp.train(init)
    assert np.isfinite(nll)
    # n <= m short-circuits to the defaults
    small = GP(X[:50], y[:50])
    np.testing.assert_allclose(small.subset_init_hyps(m=128),
                               small.get_default_hyps())


def test_nll_refined_matches_raw():
    """nll_refined == nll_raw to roundoff in f64 (E = 0 regime), and the
    machinery (streamed matvec, probes, refinement) stays finite in f32."""
    from gp_tpu import SE_ARD
    from gp_tpu.models import exact
    from gp_tpu.models.base import default_hyps

    rng = np.random.default_rng(0)
    n, d = 768, 4
    X = rng.uniform(-3, 3, (n, d))
    y = np.sin(2 * X[:, 0]) + 0.05 * rng.standard_normal(n)
    hyp = np.asarray(default_hyps(SE_ARD, X, y, 1e-3, False))
    hyp[-2] = np.log(0.05)
    f_raw = float(exact.nll_raw(SE_ARD, jnp.asarray(hyp), jnp.asarray(X),
                                jnp.asarray(y)))
    f_ref = float(exact.nll_refined(SE_ARD, jnp.asarray(hyp),
                                    jnp.asarray(X), jnp.asarray(y),
                                    tile=256, probes=8))
    np.testing.assert_allclose(f_ref, f_raw, rtol=1e-10)
    f32 = float(exact.nll_refined(
        SE_ARD, jnp.asarray(hyp, jnp.float32), jnp.asarray(X, jnp.float32),
        jnp.asarray(y, jnp.float32), tile=256, probes=8))
    assert np.isfinite(f32) and abs(f32 - f_raw) / abs(f_raw) < 1e-4


def test_train_start_noise_rescue(monkeypatch):
    """An INF starting probe first rescues by inflating the start noise
    (preserving the start's length scales) before falling back to the
    random global search — the warm-start path at HBM-scale N."""
    from gp_tpu import GP

    rng = np.random.default_rng(9)
    X = np.repeat(rng.uniform(-1, 1, (40, 2)), 2, axis=0)   # duplicates
    y = np.sin(X[:, 0]) + X[:, 1] ** 2
    gp = GP(X, y)
    init = np.asarray(gp.get_default_hyps())
    init[-2] = np.log(1e-12)        # sn2 = 1e-24: singular K0 + tiny noise
    assert not np.isfinite(gp.nll(init))

    def boom(*a, **k):
        raise AssertionError("global search must not run: rescue first")

    monkeypatch.setattr(gp, "select_init_hyp", boom)
    nll = gp.train(init)
    assert np.isfinite(nll)


def test_structured_vjp_q_matches_materialized():
    """The structured gradient contraction (KernelSpec.k_noise_vjp_q —
    no N^2 Q buffer) must equal the materialized-Q jax.vjp path to f64
    roundoff, on the plain AND the far-padded (decoy) routes."""
    from gp_tpu import SE_ARD, SE_ISO
    from gp_tpu.models import exact
    from gp_tpu.models.base import default_hyps

    rng = np.random.default_rng(11)
    X = rng.standard_normal((90, 4)) * np.asarray([1.0, 5.0, 0.2, 2.0])
    y = np.cos(X[:, 1]) + 0.1 * rng.standard_normal(90)
    for kernel in (SE_ARD, SE_ISO):
        assert kernel.k_noise_vjp_q is not None
        ref_kernel = kernel._replace(k_noise_vjp_q=None)
        hyp = jnp.asarray(default_hyps(kernel, X, y, 1e-3, False))
        hyp = hyp.at[-2].set(np.log(0.07))
        x_d, y_d = jnp.asarray(X), jnp.asarray(y)

        f0, g0 = exact.nll_vg_raw(ref_kernel, hyp, x_d, y_d)
        f1, g1 = exact.nll_vg_raw(kernel, hyp, x_d, y_d)
        np.testing.assert_allclose(float(f1), float(f0), rtol=1e-13)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                                   rtol=1e-9, atol=1e-12)

        f2, g2 = exact._nll_vg_far_padded(ref_kernel, hyp, x_d, y_d, 64)
        f3, g3 = exact._nll_vg_far_padded(kernel, hyp, x_d, y_d, 64)
        np.testing.assert_allclose(float(f3), float(f2), rtol=1e-13)
        np.testing.assert_allclose(np.asarray(g3), np.asarray(g2),
                                   rtol=1e-9, atol=1e-12)
