"""WHAM umbrella-PMF tests (reference: gmxana/gmx_wham.cpp).

Synthetic-window validation: draw exact Boltzmann samples from known
PMFs under harmonic biases and check the recovered profile — the same
acceptance idea as the reference's wham regression data, but with an
analytic ground truth.
"""
import os

import numpy as np
import pytest

from gromacs_fep_gpu_tpu.analysis.wham import (read_pullx, wham,
                                               write_pmf_xvg)
from gromacs_fep_gpu_tpu.core.units import BOLTZ

TEMP = 300.0
KT = BOLTZ * TEMP


def _metropolis_samples(u_total, lo, hi, n, rng, x_init):
    """1-D Metropolis sampler for exp(-U(x)/kT) on [lo, hi]."""
    x = x_init
    out = np.empty(n)
    step = 0.08 * (hi - lo)
    u = u_total(x)
    for i in range(n):
        for _ in range(5):
            xn = x + rng.uniform(-step, step)
            if lo <= xn <= hi:
                un = u_total(xn)
                if rng.random() < np.exp(-(un - u) / KT):
                    x, u = xn, un
        out[i] = x
    return out


def test_wham_flat_pmf():
    """Free particle under umbrellas: recovered PMF must be flat."""
    rng = np.random.default_rng(3)
    k = 100.0    # sigma ~ 0.16 nm vs 0.25 nm spacing: windows overlap
    x0s = np.linspace(0.5, 2.5, 9)
    sigma = np.sqrt(KT / k)
    samples = [rng.normal(x0, sigma, 4000) for x0 in x0s]
    centers, pmf, _ = wham(samples, x0s, [k] * len(x0s), temp=TEMP,
                           n_bins=80)
    # interior bins (edges are noisy/low-count)
    mask = (centers > 0.7) & (centers < 2.3) & np.isfinite(pmf)
    spread = np.nanmax(pmf[mask]) - np.nanmin(pmf[mask])
    assert spread < 1.0            # kJ/mol; ~kT/2.5 flatness


def test_wham_harmonic_pmf():
    """PMF = 0.5*K*(x-c)^2: each window samples the exact composite
    Gaussian, WHAM must reconstruct the harmonic well."""
    rng = np.random.default_rng(11)
    K_pmf, c = 500.0, 1.5
    k_umb = 300.0   # composite sigma ~ 0.06 nm vs 0.14 nm spacing
    x0s = np.linspace(0.8, 2.2, 11)
    samples = []
    for x0 in x0s:
        k_tot = K_pmf + k_umb
        mean = (K_pmf * c + k_umb * x0) / k_tot
        samples.append(rng.normal(mean, np.sqrt(KT / k_tot), 4000))
    centers, pmf, _ = wham(samples, x0s, [k_umb] * len(x0s), temp=TEMP,
                           n_bins=100)
    mask = (centers > 1.1) & (centers < 1.9) & np.isfinite(pmf)
    want = 0.5 * K_pmf * (centers[mask] - c) ** 2
    want = want - want.min()
    np.testing.assert_allclose(pmf[mask], want, atol=1.5)


def test_wham_double_well_metropolis():
    """Double-well PMF sampled by biased Metropolis chains — barrier
    height recovered within sampling noise."""
    a, b = 1.0, 2.0
    barrier = 12.0

    def pmf_true(x):
        return barrier * (((x - 1.5) / 0.5) ** 2 - 1.0) ** 2

    k_umb = 400.0
    x0s = np.linspace(0.7, 2.3, 13)
    rng = np.random.default_rng(7)
    samples = []
    for x0 in x0s:
        u = lambda x: pmf_true(x) + 0.5 * k_umb * (x - x0) ** 2
        samples.append(_metropolis_samples(u, a - 0.4, b + 0.4, 1500,
                                           rng, x0))
    centers, pmf, _ = wham(samples, x0s, [k_umb] * len(x0s), temp=TEMP,
                           n_bins=90)
    # wells near 1.0 and 2.0, barrier near 1.5
    mid = np.nanargmin(np.abs(centers - 1.5))
    well = np.nanargmin(np.abs(centers - 1.0))
    assert pmf[mid] - pmf[well] == pytest.approx(barrier, abs=3.0)


def test_wham_cli_roundtrip(tmp_path):
    """pullx.xvg files through the CLI surface."""
    from gromacs_fep_gpu_tpu.cli import main as cli_main

    rng = np.random.default_rng(5)
    k = 300.0
    x0s = [1.0, 1.2, 1.4]
    files = []
    for i, x0 in enumerate(x0s):
        s = rng.normal(x0, np.sqrt(KT / k), 2000)
        p = tmp_path / f"w{i}.pullx.xvg"
        with open(p, "w") as f:
            f.write("@ title \"Pull COM coordinates\"\n")
            for t, v in enumerate(s):
                f.write(f"{t * 0.1:.4f} {v:.6f}\n")
        files.append(str(p))
    out = str(tmp_path / "pmf.xvg")
    cli_main(["wham", "-ix"] + files
             + ["-x0"] + [str(v) for v in x0s]
             + ["-k"] + [str(k)] * 3 + ["-o", out, "-bins", "60"])
    assert os.path.exists(out)
    data = np.loadtxt(out, comments=("@", "#"))
    assert data.shape[1] == 2 and np.isfinite(data).all()
    # flat PMF again
    pmf = data[:, 1]
    x = data[:, 0]
    m = (x > 1.02) & (x < 1.38)
    assert pmf[m].max() - pmf[m].min() < 1.2
    # read_pullx picks the right column
    assert read_pullx(files[0]).shape == (2000,)
