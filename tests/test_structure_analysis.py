"""rdf/msd analysis tests against analytic ground truths
(reference: gmxana/gmx_rdf.cpp, gmx_msd.cpp)."""
import os

import numpy as np

from gromacs_fep_gpu_tpu.analysis.structure import (fit_diffusion, msd,
                                                    rdf)


def test_rdf_ideal_gas_is_one():
    """Uniform random points: g(r) = 1 everywhere (within noise)."""
    rng = np.random.default_rng(0)
    L = 5.0
    frames = [rng.random((400, 3)) * L for _ in range(8)]
    boxes = [np.eye(3) * L] * 8
    r, g = rdf(frames, boxes, n_bins=40)
    inner = (r > 0.4) & (r < 0.49 * L)
    assert np.abs(g[inner] - 1.0).max() < 0.15
    # excluded-volume hole at tiny r is NOT expected for an ideal gas
    # (just noisy); total counts integrate to N-1 per atom
    assert g[inner].mean() == pytest_approx(1.0, 0.03)


def pytest_approx(v, tol):
    class _A:
        def __eq__(self, other):
            return abs(other - v) < tol
    return _A()


def test_rdf_simple_cubic_peaks():
    """A perfect simple-cubic lattice: first g(r) peak at the lattice
    constant, zero below it."""
    a = 0.5
    n_side = 6
    grid = np.mgrid[0:n_side, 0:n_side, 0:n_side].reshape(3, -1).T
    x = grid * a
    L = n_side * a
    r, g = rdf([x], [np.eye(3) * L], n_bins=120, r_max=1.2)
    below = r < 0.45
    assert g[below].max() == 0.0
    first_peak = np.nonzero(g > 1.0)[0][0]
    assert abs(r[first_peak] - a) < 0.02
    # second shell at a*sqrt(2) also resolved
    second = np.nonzero(g > 1.0)[0]
    assert any(abs(r[j] - a * np.sqrt(2)) < 0.02 for j in second)


def test_msd_ballistic_and_diffusive():
    """Constant-velocity atoms: MSD = v^2 t^2; random-walk atoms:
    MSD = 6 D t with D recovered by the Einstein fit."""
    # ballistic
    T, N = 20, 50
    rng = np.random.default_rng(1)
    v = rng.normal(size=(N, 3))
    times = np.arange(T) * 0.1
    frames = [v * t for t in times]
    lags, m = msd(frames, times, n_restarts=1)
    v2 = (v * v).sum(-1).mean()
    np.testing.assert_allclose(m[1:], v2 * lags[1:] ** 2, rtol=1e-5)

    # diffusive: x_{t+1} = x_t + N(0, 2 D dt)
    D, dt = 0.05, 0.2
    T = 400
    steps = rng.normal(0.0, np.sqrt(2 * D * dt), (T - 1, 200, 3))
    x = np.concatenate([np.zeros((1, 200, 3)), np.cumsum(steps, 0)])
    times = np.arange(T) * dt
    lags, m = msd(list(x), times, n_restarts=20)
    d_fit = fit_diffusion(lags, m)
    np.testing.assert_allclose(d_fit, D, rtol=0.15)


def test_rdf_msd_cli(tmp_path):
    from gromacs_fep_gpu_tpu.cli import main as cli_main
    from gromacs_fep_gpu_tpu.io.trrio import write_trr_frame

    rng = np.random.default_rng(3)
    L = 4.0
    traj = str(tmp_path / "t.trr")
    x0 = rng.random((100, 3)) * L
    for i in range(6):
        write_trr_frame(traj, (x0 + 0.01 * i).astype(np.float32),
                        np.eye(3, dtype=np.float32) * L, step=i,
                        time=i * 0.5)
    out_r = str(tmp_path / "rdf.xvg")
    out_m = str(tmp_path / "msd.xvg")
    cli_main(["rdf", "-f", traj, "-o", out_r, "-bins", "30"])
    cli_main(["msd", "-f", traj, "-o", out_m, "-restarts", "2"])
    gr = np.loadtxt(out_r, comments="@")
    mm = np.loadtxt(out_m, comments="@")
    assert gr.shape[1] == 2 and np.isfinite(gr).all()
    assert mm.shape[1] == 2 and np.isfinite(mm).all()
    # drifting rigidly at 0.01*sqrt(3) nm per 0.5 ps
    step_msd = 3 * 0.01 ** 2
    np.testing.assert_allclose(mm[1, 1], step_msd, rtol=1e-4)