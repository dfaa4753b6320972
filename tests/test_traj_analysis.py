"""rms/rmsf/gyrate/mindist/density/hbond analysis tests against
analytic ground truth (reference: gmxana gmx_rms.cpp, gmx_rmsf.cpp,
gmx_gyrate.cpp, gmx_mindist.cpp, gmx_density.cpp, gmx_hbond.cpp)."""
import numpy as np
import pytest

from gromacs_fep_gpu_tpu.analysis.traj import (density_profile, gyrate,
                                               hbond_series, hbonds,
                                               kabsch, mindist, rms_series,
                                               rmsf)


def _rand_rot(seed):
    rng = np.random.RandomState(seed)
    q = rng.randn(4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])


def test_rms_invariant_to_rigid_motion():
    rng = np.random.RandomState(0)
    xref = rng.rand(20, 3)
    frames = [xref @ _rand_rot(i).T + rng.rand(3) for i in range(4)]
    s = rms_series(frames, xref)
    np.testing.assert_allclose(s, 0.0, atol=1e-10)
    # without fitting the same frames have large RMSD
    s_nofit = rms_series(frames, xref, fit=False)
    assert s_nofit.min() > 0.01


def test_rms_known_displacement():
    xref = np.zeros((4, 3))
    xref[:, 0] = [0.0, 1.0, 2.0, 3.0]
    # move ONE atom by d perpendicular to the line; optimal fit is
    # bounded above by the unfitted rmsd = d/2
    x = xref.copy()
    x[0, 1] = 0.2
    (s_nofit,) = rms_series([x], xref, fit=False)
    # COM removal spreads the 0.2 displacement: dev = (0.15, -0.05 x3)
    np.testing.assert_allclose(s_nofit, 0.2 * np.sqrt(3) / 4, atol=1e-12)
    (s_fit,) = rms_series([x], xref)
    assert s_fit <= s_nofit + 1e-12


def test_kabsch_recovers_rotation():
    rng = np.random.RandomState(3)
    x = rng.rand(10, 3) - 0.5
    rot = _rand_rot(7)
    r = kabsch(x @ rot.T, x)
    # kabsch(a, b) returns R with R @ a_i = b_i; here a_i = rot @ x_i
    np.testing.assert_allclose(r @ rot @ x.T, x.T, atol=1e-10)


def test_rmsf_two_state_oscillation():
    # 8 cube corners (rigid, well-conditioned fit) + 1 oscillating atom
    g = np.array([[i, j, k] for i in (0, 1) for j in (0, 1)
                  for k in (0, 1)], float)
    xref = np.concatenate([g, [[0.5, 0.5, 0.5]]])
    a = xref.copy()
    b = xref.copy()
    a[8, 2] += 0.1
    b[8, 2] -= 0.1
    f = rmsf([a, b] * 10, xref)
    # COM removal: the oscillating atom keeps 8/9 of its amplitude
    assert f[8] == pytest.approx(0.1 * 8 / 9, rel=0.02)
    assert f[:8].max() < 0.03


def test_gyrate_ring_analytic():
    # N equal masses on a circle of radius R: Rg = R exactly
    th = np.linspace(0, 2 * np.pi, 12, endpoint=False)
    x = np.stack([np.cos(th), np.sin(th), np.zeros_like(th)], 1) * 0.7
    (rg,) = gyrate([x], np.ones(12))
    np.testing.assert_allclose(rg, 0.7, rtol=1e-12)
    # mass weighting: heavy atom at the center pulls Rg down
    x2 = np.concatenate([x, np.zeros((1, 3))])
    m2 = np.concatenate([np.ones(12), [12.0]])
    (rg2,) = gyrate([x2], m2)
    np.testing.assert_allclose(rg2, 0.7 * np.sqrt(12 / 24), rtol=1e-12)


def test_mindist_minimum_image():
    box = [np.diag([2.0, 2.0, 2.0])]
    x = np.array([[0.1, 0.0, 0.0], [1.9, 0.0, 0.0], [1.0, 1.0, 1.0]])
    d = mindist([x], box, np.array([0]), np.array([1, 2]))
    np.testing.assert_allclose(d, [0.2], atol=1e-12)  # through the wall


def test_density_profile_slab():
    # all mass in the lower half of z -> density doubles there
    rng = np.random.RandomState(1)
    x = rng.rand(4000, 3) * [2.0, 2.0, 1.0]       # z in [0, 1) of Lz=2
    box = np.diag([2.0, 2.0, 2.0])
    centers, dens = density_profile([x], [box], np.ones(4000), axis=2,
                                    nslices=10)
    amu = 1.66053906660
    lower = dens[:5].mean()
    upper = dens[5:].mean()
    # mean density = 4000 amu / 8 nm^3 = 500*amu kg/m^3, all in lower half
    np.testing.assert_allclose(lower, 2 * 500 * amu, rtol=0.05)
    assert upper == 0.0
    assert centers[0] == pytest.approx(0.1)


def test_hbond_geometry():
    box = np.diag([3.0, 3.0, 3.0])
    # donor O at origin with H pointing at acceptor O at 0.3 nm: 1 bond
    x = np.array([[0.0, 0.0, 0.0],     # O donor
                  [0.1, 0.0, 0.0],     # H on the D-A axis
                  [0.3, 0.0, 0.0]])    # O acceptor
    n = hbonds(x, box, donors=np.array([0]), hydrogens=np.array([1]),
               acceptors=np.array([0, 2]))
    assert n == 1
    # rotate H 60 degrees off axis -> angle criterion kills it
    x2 = x.copy()
    x2[1] = [0.05, 0.05 * np.sqrt(3), 0.0]
    n2 = hbonds(x2, box, donors=np.array([0]), hydrogens=np.array([1]),
                acceptors=np.array([0, 2]))
    assert n2 == 0
    # stretch D-A beyond 0.35 -> distance criterion kills it
    x3 = x.copy()
    x3[2, 0] = 0.4
    n3 = hbonds(x3, box, donors=np.array([0]), hydrogens=np.array([1]),
                acceptors=np.array([0, 2]))
    assert n3 == 0


def test_hbond_series_and_pbc():
    box = np.diag([1.0, 1.0, 1.0])
    # acceptor across the periodic wall
    x = np.array([[0.05, 0.5, 0.5], [0.15, 0.5, 0.5], [0.85, 0.5, 0.5]])
    s = hbond_series([x], [box], np.array([0]), np.array([1]),
                     np.array([2]))
    # D-A through the wall = 0.2 nm but H points the wrong way
    assert s[0] == 0
    x2 = x.copy()
    x2[1] = [0.95, 0.5, 0.5]   # H toward the wall (wrapped)
    s2 = hbond_series([x2], [box], np.array([0]), np.array([1]),
                      np.array([2]))
    assert s2[0] == 1


def test_cli_traj_tools(tmp_path, monkeypatch):
    """Drive rms/gyrate/mindist/density/hbond through the CLI on a tiny
    synthetic trajectory."""
    from gromacs_fep_gpu_tpu.cli import main
    from gromacs_fep_gpu_tpu.io.groio import write_gro
    from gromacs_fep_gpu_tpu.io.trrio import write_trr_frame
    from gromacs_fep_gpu_tpu.io.xvgio import read_xvg

    monkeypatch.chdir(tmp_path)
    names = ["OW", "HW1", "HW2"] * 2
    res = ["SOL"] * 6
    x = np.array([[0.5, 0.5, 0.5], [0.6, 0.5, 0.5], [0.5, 0.6, 0.5],
                  [0.8, 0.5, 0.5], [0.9, 0.5, 0.5], [0.8, 0.6, 0.5]],
                 np.float32)
    box = np.diag([2.0, 2.0, 2.0]).astype(np.float32)
    write_gro("c.gro", "w2", names, res, x, None, box)
    for k in range(3):
        write_trr_frame("t.trr", x + 0.001 * k, box, step=k,
                        time=0.002 * k)
    main(["rms", "-f", "t.trr", "-s", "c.gro", "-o", "rms.xvg"])
    data, _ = read_xvg("rms.xvg")
    assert data.shape[0] == 3 and np.all(data[:, 1] < 1e-5)  # rigid shift
    main(["gyrate", "-f", "t.trr", "-s", "c.gro", "-o", "gy.xvg"])
    gy, _ = read_xvg("gy.xvg")
    assert np.all(gy[:, 1] > 0.0)
    main(["mindist", "-f", "t.trr", "-g1", "1 2 3", "-g2", "4 5 6",
          "-o", "md.xvg"])
    md, _ = read_xvg("md.xvg")
    # closest pair is HW1 of water 1 (0.6) to OW of water 2 (0.8)
    np.testing.assert_allclose(md[:, 1], 0.2, atol=1e-3)
    main(["density", "-f", "t.trr", "-s", "c.gro", "-axis", "z",
          "-sl", "4", "-o", "dens.xvg"])
    dn, _ = read_xvg("dens.xvg")
    assert dn[1, 1] > 0 and dn[3, 1] == 0.0   # everything at z~0.5
    main(["hbond", "-f", "t.trr", "-s", "c.gro", "-o", "hb.xvg"])
    hb, _ = read_xvg("hb.xvg")
    # water 1's HW1 points at water 2's OW (0 deg); both of water 2's
    # hydrogens point away from water 1 -> exactly one H-bond
    assert np.all(hb[:, 1] == 1.0)
