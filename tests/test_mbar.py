"""MBAR estimator tests (Shirts & Chodera 2008; the multistate
counterpart of gmx bar)."""
import numpy as np
import pytest

from gromacs_fep_gpu_tpu.analysis.bar import bar
from gromacs_fep_gpu_tpu.analysis.mbar import (mbar, mbar_solve,
                                               mbar_weights)


def _harmonic_samples(springs, n, seed=0, kt=1.0):
    """Samples from 1-D harmonic states U_k = K_k x^2 / 2 at beta=1/kt.
    Exact dimensionless f_k = -ln sqrt(2 pi kt / K_k)."""
    rng = np.random.RandomState(seed)
    xs, idx = [], []
    for i, K in enumerate(springs):
        xs.append(rng.normal(0.0, np.sqrt(kt / K), n))
        idx.append(np.full(n, i))
    x = np.concatenate(xs)
    idx = np.concatenate(idx)
    u = 0.5 * np.asarray(springs)[None, :] * x[:, None] ** 2   # (N, L)
    f_exact = -np.log(np.sqrt(2 * np.pi * kt / np.asarray(springs)))
    return x, idx, u, f_exact - f_exact[0]


def test_mbar_harmonic_exact():
    springs = [1.0, 2.0, 4.0, 8.0]
    _, idx, u, f_exact = _harmonic_samples(springs, 6000, seed=3)
    # feed dH rows (U_m - U_origin): the per-sample constant must cancel
    dh = u - u[np.arange(len(idx)), idx][:, None]
    f, errs = mbar(dh, idx, kt=1.0)
    np.testing.assert_allclose(f, f_exact, atol=0.05)
    assert (errs[1:] > 0).all() and errs.max() < 0.05


def test_mbar_invariant_to_per_sample_constant():
    springs = [1.0, 3.0]
    _, idx, u, _ = _harmonic_samples(springs, 2000, seed=5)
    dh = u - u[np.arange(len(idx)), idx][:, None]
    f1, _ = mbar(dh, idx, kt=1.0, n_blocks=1)
    shifted = dh + np.linspace(-5, 5, len(idx))[:, None]
    f2, _ = mbar(shifted, idx, kt=1.0, n_blocks=1)
    np.testing.assert_allclose(f1, f2, atol=1e-8)


def test_mbar_matches_bar_two_states():
    springs = [1.0, 5.0]
    _, idx, u, f_exact = _harmonic_samples(springs, 8000, seed=11)
    dh = u - u[np.arange(len(idx)), idx][:, None]
    f, _ = mbar(dh, idx, kt=1.0, n_blocks=1)
    # pairwise BAR on the same samples
    fwd = dh[idx == 0][:, 1]
    rev = dh[idx == 1][:, 0]
    dg_bar, _ = bar(fwd, rev, kt=1.0)
    np.testing.assert_allclose(f[1], dg_bar, atol=0.02)
    np.testing.assert_allclose(f[1], f_exact[1], atol=0.03)


def test_mbar_weights_normalized():
    springs = [1.0, 2.0]
    _, idx, u, _ = _harmonic_samples(springs, 1000, seed=7)
    n_k = np.bincount(idx)
    f = mbar_solve(u.T, n_k)
    w = mbar_weights(u.T, n_k, f)
    np.testing.assert_allclose(w.sum(0), 1.0, rtol=1e-8)


def test_mbar_missing_state_raises():
    dh = np.zeros((10, 3))
    with pytest.raises(ValueError):
        mbar(dh, np.zeros(10, int), kt=1.0, n_blocks=1)


def test_cli_bar_mbar(tmp_path, monkeypatch, capsys):
    """bar -method mbar over generated dhdl.xvg windows."""
    from gromacs_fep_gpu_tpu.cli import main
    from gromacs_fep_gpu_tpu.core.units import BOLTZ
    from gromacs_fep_gpu_tpu.io.xvgio import write_dhdl_xvg

    monkeypatch.chdir(tmp_path)
    kt = BOLTZ * 300.0
    springs = [1.0, 2.0, 4.0]
    _, idx, u, f_exact = _harmonic_samples(springs, 3000, seed=1, kt=kt)
    lambdas = np.zeros((3, 7))
    lambdas[:, 2] = lambdas[:, 3] = [0.0, 0.5, 1.0]
    files = []
    for i in range(3):
        rows = u[idx == i] - u[idx == i][:, i][:, None]
        t = np.arange(rows.shape[0]) * 0.002
        write_dhdl_xvg(f"w{i}.dhdl.xvg", t, np.zeros((len(t), 7)),
                       rows, lambdas, i, temperature=300.0)
        files.append(f"w{i}.dhdl.xvg")
    main(["bar", "-f", *files, "-method", "mbar", "-b", "0"])
    out = capsys.readouterr().out
    assert "total (MBAR)" in out
    total = float(out.split("total (MBAR)")[1].split()[0])
    np.testing.assert_allclose(total, f_exact[-1] * kt, atol=0.1)
