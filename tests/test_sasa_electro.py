"""SASA + dipoles + potential-profile tests against closed-form results
(reference: trajectoryanalysis/modules/sasa.cpp, gmxana/gmx_dipoles.cpp,
gmxana/gmx_potential.cpp)."""
import numpy as np
import pytest

from gromacs_fep_gpu_tpu.analysis.electro import (ENM2DEBYE, EPS0,
                                                  dipole_series,
                                                  dipole_stats,
                                                  potential_profile)
from gromacs_fep_gpu_tpu.analysis.sasa import (golden_spiral_points,
                                               radii_from_nbfp, sasa)


def test_golden_spiral_uniformity():
    pts = golden_spiral_points(500)
    np.testing.assert_allclose(np.linalg.norm(pts, axis=1), 1.0,
                               atol=1e-12)
    # near-uniform: mean position ~ 0
    assert np.abs(pts.mean(0)).max() < 0.01


def test_sasa_isolated_sphere():
    (total, per) = sasa(np.zeros((1, 3)), np.asarray([0.1]), probe=0.14)
    np.testing.assert_allclose(total, 4 * np.pi * 0.24 ** 2, rtol=1e-12)
    # two far-apart atoms just add
    x = np.asarray([[0.0, 0.0, 0.0], [5.0, 0.0, 0.0]])
    total2, _ = sasa(x, np.asarray([0.1, 0.1]), probe=0.14)
    np.testing.assert_allclose(total2, 2 * total, rtol=1e-12)


def test_sasa_two_overlapping_spheres_analytic():
    # equal expanded radii R at distance d < 2R: each loses a spherical
    # cap of height h = R - d/2 (area 2 pi R h)
    r_vdw, probe = 0.1, 0.14
    R = r_vdw + probe
    d = 0.3
    x = np.asarray([[0.0, 0.0, 0.0], [d, 0.0, 0.0]])
    total, per = sasa(x, np.asarray([r_vdw, r_vdw]), probe=probe,
                      n_points=4000)
    h = R - d / 2
    expect_each = 4 * np.pi * R ** 2 - 2 * np.pi * R * h
    np.testing.assert_allclose(per, expect_each, rtol=0.02)
    np.testing.assert_allclose(total, 2 * expect_each, rtol=0.02)


def test_sasa_periodic_neighbor():
    # neighbor through the wall occludes only with box given
    x = np.asarray([[0.05, 0.5, 0.5], [0.95, 0.5, 0.5]])
    r = np.asarray([0.1, 0.1])
    box = np.diag([1.0, 1.0, 1.0])
    t_pbc, _ = sasa(x, r, probe=0.05, box=box)
    t_nopbc, _ = sasa(x, r, probe=0.05)
    assert t_pbc < t_nopbc


def test_radii_from_nbfp():
    sigma, eps = 0.3, 0.6
    c6 = 4 * eps * sigma ** 6
    c12 = 4 * eps * sigma ** 12
    nbfp = np.zeros((2, 2, 2))
    nbfp[1, 1] = (c6, c12)
    r = radii_from_nbfp(nbfp, np.asarray([1, 0]), default=0.15)
    np.testing.assert_allclose(r[0], sigma / 2, rtol=1e-12)
    np.testing.assert_allclose(r[1], 0.15)   # no LJ -> default


def test_dipole_series_and_stats():
    q = np.asarray([1.0, -1.0])
    x = np.asarray([[0.1, 0.0, 0.0], [0.0, 0.0, 0.0]])
    m = dipole_series([x, x], q)
    np.testing.assert_allclose(m, [[0.1, 0, 0]] * 2, atol=1e-15)
    st = dipole_stats(m, volume_nm3=27.0, temperature=300.0)
    np.testing.assert_allclose(st["mu_mean_D"], 0.1 * ENM2DEBYE,
                               rtol=1e-12)
    # a frozen dipole has zero fluctuation -> epsilon = 1
    np.testing.assert_allclose(st["epsilon"], 1.0, atol=1e-9)
    # neutral selection: M independent of origin
    m2 = dipole_series([x + 7.3], q)
    np.testing.assert_allclose(m2, [[0.1, 0, 0]], atol=1e-12)


def test_potential_profile_capacitor():
    """Two opposite charge sheets: the potential drop between the plates
    is sigma*d/eps0 (ideal capacitor), flat outside."""
    L, A_side = 4.0, 1.0
    n = 16
    # + sheet at z=1, - sheet at z=3, spread in xy
    xy = np.stack(np.meshgrid(np.linspace(0.1, 0.9, 4),
                              np.linspace(0.1, 0.9, 4)), -1).reshape(-1, 2)
    xp = np.concatenate([xy, np.full((n, 1), 1.0)], 1)
    xm = np.concatenate([xy, np.full((n, 1), 3.0)], 1)
    x = np.concatenate([xp, xm])
    q = np.concatenate([np.full(n, 1.0 / n), np.full(n, -1.0 / n)])
    box = np.diag([A_side, A_side, L])
    centers, rho, volt = potential_profile([x], [box], q, axis=2,
                                           nslices=80)
    sigma = 1.0 / (A_side * A_side)        # e/nm^2
    dv_expect = -sigma * 2.0 / EPS0 * 0.010364272
    in_gap = (centers > 1.2) & (centers < 2.8)
    # linear in the gap: constant slope
    slope = np.diff(volt[in_gap]) / np.diff(centers[in_gap])
    np.testing.assert_allclose(slope, slope[0], rtol=1e-6)
    # total drop across the plates
    v_after = volt[centers > 3.2].mean()
    v_before = volt[centers < 0.8].mean()
    np.testing.assert_allclose(v_after - v_before, dv_expect, rtol=0.05)
    # flat outside the plates
    assert np.abs(np.diff(volt[centers < 0.8])).max() < 1e-9
    # charge density integrates to zero
    np.testing.assert_allclose(rho.sum(), 0.0, atol=1e-9)


def test_cli_sasa_dipoles_potential(tmp_path, monkeypatch):
    from gromacs_fep_gpu_tpu.cli import main
    from gromacs_fep_gpu_tpu.io.trrio import write_trr_frame
    from gromacs_fep_gpu_tpu.io.xvgio import read_xvg
    from tests.test_cli import MDP, TOP, make_water_gro

    monkeypatch.chdir(tmp_path)
    make_water_gro("conf.gro")
    with open("topol.top", "w") as f:
        f.write(TOP)
    with open("md.mdp", "w") as f:
        f.write(MDP)
    main(["grompp", "-f", "md.mdp", "-p", "topol.top", "-c", "conf.gro",
          "-o", "topol.tpz"])
    from gromacs_fep_gpu_tpu.io.groio import read_gro
    _, _, x, _, box = read_gro("conf.gro")
    for k in range(2):
        write_trr_frame("t.trr", x.astype(np.float32),
                        box.astype(np.float32), step=k, time=0.002 * k)
    main(["sasa", "-f", "t.trr", "-s", "topol.tpz", "-o", "sa.xvg",
          "-ndots", "60"])
    # the mass-needing tools must accept a .tpz for -s too
    main(["rms", "-f", "t.trr", "-s", "topol.tpz", "-o", "rmstpz.xvg"])
    main(["gyrate", "-f", "t.trr", "-s", "topol.tpz", "-o", "gytpz.xvg"])
    sa, _ = read_xvg("sa.xvg")
    assert (sa[:, 1] > 0).all()
    main(["dipoles", "-f", "t.trr", "-s", "topol.tpz", "-o", "dip.xvg"])
    dp, _ = read_xvg("dip.xvg")
    assert np.isfinite(dp).all() and (dp[:, 1] >= 0).all()
    main(["potential", "-f", "t.trr", "-s", "topol.tpz", "-o", "pot.xvg"])
    pt, _ = read_xvg("pot.xvg")
    assert np.isfinite(pt).all()
