"""distance / angle / convert-tpr / check -f tool tests
(reference: gmx distance, gmx angle, tools/convert_tpr.cpp,
tools/check.cpp)."""
import numpy as np
import pytest

from gromacs_fep_gpu_tpu.cli import main
from gromacs_fep_gpu_tpu.io.trrio import write_trr_frame
from gromacs_fep_gpu_tpu.io.xvgio import read_xvg


def _traj(path, coords, box_l=2.0):
    box = np.diag([box_l] * 3).astype(np.float32)
    for k, x in enumerate(coords):
        write_trr_frame(path, np.asarray(x, np.float32), box, step=k,
                        time=0.002 * k)
    return box


def test_distance_com_minimum_image(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    x = [[[0.1, 0.5, 0.5], [0.3, 0.5, 0.5],     # group 1 COM at 0.2
          [1.9, 0.5, 0.5]],                     # group 2 through the wall
         [[0.1, 0.5, 0.5], [0.3, 0.5, 0.5], [1.8, 0.5, 0.5]]]
    _traj("t.trr", x)
    main(["distance", "-f", "t.trr", "-g1", "1 2", "-g2", "3",
          "-o", "d.xvg"])
    d, _ = read_xvg("d.xvg")
    np.testing.assert_allclose(d[:, 1], [0.3, 0.4], atol=1e-3)


def test_angle_and_dihedral(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    # right angle at atom 2; trans dihedral (180) then cis (0)
    x0 = [[0.5, 0.5, 0.5], [0.6, 0.5, 0.5], [0.6, 0.6, 0.5],
          [0.7, 0.6, 0.5]]
    _traj("t.trr", [x0])
    main(["angle", "-f", "t.trr", "-sel", "1 2 3", "-o", "a.xvg"])
    a, _ = read_xvg("a.xvg")
    np.testing.assert_allclose(a[0, 1], 90.0, atol=1e-3)
    main(["angle", "-f", "t.trr", "-sel", "1 2 3 4", "-type",
          "dihedral", "-o", "dh.xvg"])
    dh, _ = read_xvg("dh.xvg")
    np.testing.assert_allclose(abs(dh[0, 1]), 180.0, atol=1e-3)
    # cis: atom 4 folded back over atom 1's side
    x1 = [[0.5, 0.5, 0.5], [0.6, 0.5, 0.5], [0.6, 0.6, 0.5],
          [0.5, 0.6, 0.5]]
    _traj("t2.trr", [x1])
    main(["angle", "-f", "t2.trr", "-sel", "1 2 3 4", "-type",
          "dihedral", "-o", "dh2.xvg"])
    dh2, _ = read_xvg("dh2.xvg")
    np.testing.assert_allclose(dh2[0, 1], 0.0, atol=1e-3)
    with pytest.raises(SystemExit):
        main(["angle", "-f", "t.trr", "-sel", "1 2", "-o", "x.xvg"])


def test_convert_tpr_extend(tmp_path, monkeypatch):
    from tests.test_cli import MDP, TOP, make_water_gro
    monkeypatch.chdir(tmp_path)
    make_water_gro("conf.gro")
    open("topol.top", "w").write(TOP)
    open("md.mdp", "w").write(MDP)        # nsteps = 30, dt in MDP
    main(["grompp", "-f", "md.mdp", "-p", "topol.top", "-c", "conf.gro",
          "-o", "topol.tpz"])
    from gromacs_fep_gpu_tpu.cli import _load_tpz
    pp0, _ = _load_tpz("topol.tpz")
    dt = pp0.params.dt
    main(["convert-tpr", "-s", "topol.tpz", "-o", "ext.tpz",
          "-extend", f"{100 * dt}"])
    pp, _ = _load_tpz("ext.tpz")
    assert pp.params.nsteps == pp0.params.nsteps + 100
    main(["convert-tpr", "-s", "topol.tpz", "-o", "n.tpz",
          "-nsteps", "7"])
    pp, _ = _load_tpz("n.tpz")
    assert pp.params.nsteps == 7
    with pytest.raises(SystemExit):
        main(["convert-tpr", "-s", "topol.tpz", "-o", "z.tpz"])


def test_check_trajectory(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    _traj("t.trr", [[[0.1, 0.2, 0.3]]] * 4, box_l=1.5)
    main(["check", "-f", "t.trr"])
    out = capsys.readouterr().out
    assert "4 frames" in out and "1 atoms" in out
    assert "non-finite frames: 0" in out
    with pytest.raises(SystemExit):
        main(["check"])


def test_g96_roundtrip_and_editconf(tmp_path, monkeypatch):
    """g96 block format roundtrip + editconf conversion
    (reference: fileio/g96io.cpp)."""
    from gromacs_fep_gpu_tpu.io.g96io import read_g96, write_g96
    from gromacs_fep_gpu_tpu.io.groio import write_gro
    from gromacs_fep_gpu_tpu.io.pdbio import read_structure

    monkeypatch.chdir(tmp_path)
    names = ["OW", "HW1", "HW2"]
    res = ["SOL"] * 3
    x = np.array([[0.123456789, 0.5, 0.5], [0.6, 0.5, 0.5],
                  [0.5, 0.6, 0.5]])
    v = np.array([[0.1, -0.2, 0.3]] * 3)
    box = np.diag([2.0, 2.5, 3.0])
    write_g96("a.g96", "water", names, res, x, v, box)
    n2, r2, x2, v2, b2 = read_g96("a.g96")
    assert n2 == names and r2 == res
    np.testing.assert_allclose(x2, x, atol=1e-9)   # 9 decimals
    np.testing.assert_allclose(v2, v, atol=1e-9)
    np.testing.assert_allclose(b2, box, atol=1e-9)
    # read_structure dispatch + editconf gro -> g96
    n3, _, x3, _, _ = read_structure("a.g96")
    assert n3 == names
    write_gro("a.gro", "t", names, res, x, None, box)
    main(["editconf", "-f", "a.gro", "-o", "conv.g96", "-box", "4"])
    _, _, xc, _, bc = read_g96("conv.g96")
    np.testing.assert_allclose(np.diag(bc), 4.0, atol=1e-9)
    np.testing.assert_allclose(xc, x, atol=1e-3)   # gro is 3 decimals


def test_lie_tool(tmp_path, monkeypatch, capsys):
    """LIE estimate from a synthetic energygrps xvg
    (reference: gmxana/gmx_lie.cpp formula)."""
    monkeypatch.chdir(tmp_path)
    with open("rr.eg.xvg", "w") as f:
        f.write('@    title "Group pair energies"\n')
        for s, leg in enumerate(["Coul-SR:LIG-LIG", "LJ-SR:LIG-LIG",
                                 "Coul-SR:LIG-SOL", "LJ-SR:LIG-SOL",
                                 "Coul-SR:SOL-SOL", "LJ-SR:SOL-SOL"]):
            f.write(f'@ s{s} legend "{leg}"\n')
        for t in range(4):
            # LIG-SOL: coul -40, lj -20 (constant)
            f.write(f"{0.002 * t:.4f} 1.0 2.0 -40.0 -20.0 -500.0 "
                    "30.0\n")
    main(["lie", "-f", "rr.eg.xvg", "-ligand", "LIG",
          "-elj", "-10", "-eqq", "-30", "-alpha", "0.2", "-beta",
          "0.5"])
    out = capsys.readouterr().out
    # dG = 0.2*(-20 - -10) + 0.5*(-40 - -30) = -2 - 5 = -7
    assert "DeltaG_bind (LIE) = -7.000" in out
    with pytest.raises(SystemExit):
        main(["lie", "-f", "rr.eg.xvg", "-ligand", "XXX"])


def test_vacf_dos_harmonic():
    """Analytic: v(t) = cos(w t) gives C(t) = cos(w t) and a spectrum
    peaked at nu = w / 2 pi (reference: gmx velacc/dos)."""
    from gromacs_fep_gpu_tpu.analysis.traj import dos_spectrum, vacf
    w = 40.0                      # rad/ps
    dt = 0.004
    t = np.arange(400) * dt
    v = (np.cos(w * t)[:, None, None]
         * np.array([[[1.0, 0.5, -0.3]]]))     # one atom
    c = vacf(v)
    np.testing.assert_allclose(c[:80], np.cos(w * t[:80]), atol=0.03)
    freq, spec = dos_spectrum(c, dt)
    nu_peak = freq[np.argmax(spec)]
    np.testing.assert_allclose(nu_peak, w / (2 * np.pi), rtol=0.05)


def test_velacc_cli(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from gromacs_fep_gpu_tpu.io.xvgio import read_xvg
    box = np.diag([2.0, 2.0, 2.0]).astype(np.float32)
    w, dt = 30.0, 0.004
    x0 = np.array([[1.0, 1.0, 1.0]], np.float32)
    for k in range(64):
        v = (np.cos(w * k * dt)
             * np.array([[0.5, 0.0, 0.0]])).astype(np.float32)
        write_trr_frame("v.trr", x0, box, v=v, step=k, time=k * dt)
    main(["velacc", "-f", "v.trr", "-o", "c.xvg", "-dos", "s.xvg"])
    c, _ = read_xvg("c.xvg")
    np.testing.assert_allclose(c[0, 1], 1.0, atol=1e-9)
    np.testing.assert_allclose(c[:16, 1], np.cos(w * c[:16, 0]),
                               atol=0.05)
    s, _ = read_xvg("s.xvg")
    assert np.isfinite(s).all()


def test_grompp_r_posres_reference(tmp_path, monkeypatch):
    """grompp -r: posres reference coordinates from a separate file
    (reference: grompp.cpp gen_posres / -r)."""
    monkeypatch.chdir(tmp_path)
    from gromacs_fep_gpu_tpu.cli import _load_tpz
    from gromacs_fep_gpu_tpu.io.groio import write_gro
    top = """
[ defaults ]
1 2 yes 0.5 0.8333

[ atomtypes ]
AR 39.948 0.0 A 0.34 0.98

[ moleculetype ]
AR 1

[ atoms ]
1 AR 1 AR AR 1 0.0 39.948

[ position_restraints ]
1 1 1000 1000 1000

[ system ]
ar

[ molecules ]
AR 1
"""
    mdp = ("integrator = md\ndt = 0.002\nnsteps = 1\n"
           "coulombtype = reaction-field\nrcoulomb = 0.5\nrvdw = 0.5\n"
           "rlist = 0.55\nnstcomm = 0\n")
    open("topol.top", "w").write(top)
    open("md.mdp", "w").write(mdp)
    box = np.diag([2.0, 2.0, 2.0]).astype(np.float32)
    write_gro("conf.gro", "c", ["AR"], ["AR"],
              np.array([[1.0, 1.0, 1.0]], np.float32), None, box)
    write_gro("ref.gro", "r", ["AR"], ["AR"],
              np.array([[0.4, 0.5, 0.6]], np.float32), None, box)
    main(["grompp", "-f", "md.mdp", "-p", "topol.top", "-c", "conf.gro",
          "-r", "ref.gro", "-o", "topol.tpz"])
    pp, _ = _load_tpz("topol.tpz")
    ref = np.asarray(pp.system.bonded["posres"].params_a)[0, :3]
    np.testing.assert_allclose(ref, [0.4, 0.5, 0.6], atol=1e-3)
    # without -r the reference is the conformation itself
    main(["grompp", "-f", "md.mdp", "-p", "topol.top", "-c", "conf.gro",
          "-o", "noref.tpz"])
    pp2, _ = _load_tpz("noref.tpz")
    ref2 = np.asarray(pp2.system.bonded["posres"].params_a)[0, :3]
    np.testing.assert_allclose(ref2, [1.0, 1.0, 1.0], atol=1e-3)


def test_trjcat(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from gromacs_fep_gpu_tpu.io.trrio import read_trr_frame, scan_trr
    box = np.diag([2.0, 2.0, 2.0]).astype(np.float32)
    x = np.array([[0.5, 0.5, 0.5]], np.float32)
    for k in range(4):                  # part 1: t = 0..0.006
        write_trr_frame("a.trr", x + 0.01 * k, box,
                        v=x * 0, step=k, time=0.002 * k)
    for k in range(3, 7):               # part 2 overlaps at t=0.006
        write_trr_frame("b.trr", x + 0.01 * k, box,
                        v=x * 0, step=k, time=0.002 * k)
    main(["trjcat", "-f", "a.trr", "b.trr", "-o", "cat.trr"])
    na, nf = scan_trr("cat.trr")
    assert nf == 7                       # 4 + 4 - 1 duplicate
    ts = [read_trr_frame("cat.trr", i, na)["time"] for i in range(nf)]
    assert ts == sorted(ts) and len(set(np.round(ts, 6))) == 7
    fr = read_trr_frame("cat.trr", 6, na)
    np.testing.assert_allclose(fr["x"][0, 0], 0.56, atol=1e-4)
    assert fr["v"] is not None           # velocities preserved trr->trr


def test_genconf(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from gromacs_fep_gpu_tpu.io.groio import read_gro, write_gro
    x = np.array([[0.2, 0.3, 0.4]], np.float32)
    write_gro("in.gro", "t", ["AR"], ["AR"], x, None,
              np.diag([1.0, 1.5, 2.0]).astype(np.float32))
    main(["genconf", "-f", "in.gro", "-nbox", "2", "1", "3",
          "-o", "big.gro"])
    n, r, xo, _, box = read_gro("big.gro")
    assert len(n) == 6
    np.testing.assert_allclose(np.diag(box), [2.0, 1.5, 6.0], atol=1e-5)
    # copies at every lattice shift
    got = sorted(tuple(np.round(v, 3)) for v in xo)
    expect = sorted((0.2 + i, 0.3, 0.4 + 2.0 * k)
                    for i in (0, 1) for k in (0, 1, 2))
    np.testing.assert_allclose(got, expect, atol=1e-3)
