"""BAR estimator tests against analytic harmonic-well free energies
(role of the reference's gmx bar regression checks)."""
import numpy as np

from gromacs_fep_gpu_tpu.analysis.bar import bar, bar_profile, exp_average
from gromacs_fep_gpu_tpu.core.units import BOLTZ


def harmonic_samples(rng, n, x0, kt=1.0):
    return rng.normal(x0, np.sqrt(kt), n)


def test_bar_harmonic_offset():
    """Two equal-width harmonic wells offset by c: dG = c exactly."""
    rng = np.random.RandomState(0)
    kt = 1.0
    c = 2.5

    def u0(x):
        return 0.5 * x**2

    def u1(x):
        return 0.5 * (x - 1.0)**2 + c

    x_at_0 = harmonic_samples(rng, 20000, 0.0, kt)
    x_at_1 = harmonic_samples(rng, 20000, 1.0, kt)
    fwd = u1(x_at_0) - u0(x_at_0)
    rev = u0(x_at_1) - u1(x_at_1)
    dg, err = bar(fwd, rev, kt)
    assert abs(dg - c) < 5 * max(err, 0.02), (dg, err)


def test_exp_average_matches_bar_for_good_overlap():
    rng = np.random.RandomState(1)
    kt = 2.0
    x0 = harmonic_samples(rng, 50000, 0.0, kt)
    fwd = (0.5 * (x0 - 0.3)**2 + 1.0) - 0.5 * x0**2
    x1 = harmonic_samples(rng, 50000, 0.3, kt)
    rev = 0.5 * x1**2 - (0.5 * (x1 - 0.3)**2 + 1.0)
    dg_bar, _ = bar(fwd, rev, kt)
    dg_exp = exp_average(fwd, kt)
    assert abs(dg_bar - 1.0) < 0.05
    assert abs(dg_exp - 1.0) < 0.1


def test_bar_profile_ladder():
    """4-window ladder of shifted harmonics; total dG = sum of offsets."""
    rng = np.random.RandomState(2)
    kt = 1.0
    offsets = [0.0, 1.0, 2.5, 3.0]   # state free energies
    centers = [0.0, 0.4, 0.8, 1.2]
    L = 4
    n = 8000

    def u(l, x):
        return 0.5 * (x - centers[l])**2 + offsets[l]

    dh_rows, idx_rows = [], []
    for l in range(L):
        xs = harmonic_samples(rng, n, centers[l], kt)
        dh = np.stack([u(m, xs) - u(l, xs) for m in range(L)], axis=1)
        # store as "Delta H to each window" with own-window column = 0
        dh_rows.append(dh + u(l, xs)[:, None] - u(l, xs)[:, None])
        idx_rows.append(np.full(n, l))
    delta_h = np.concatenate(dh_rows)
    lam_idx = np.concatenate(idx_rows)
    # bar_profile expects Delta H relative to a common reference per row;
    # our rows store U_m(x) - U_l(x), so column differences are exact.
    legs, total, err = bar_profile(delta_h, lam_idx, temperature=1.0 / BOLTZ,
                                   skip_frac=0.0)
    assert abs(total - 3.0) < 0.1, (total, legs)
