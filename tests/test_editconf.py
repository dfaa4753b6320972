"""editconf + genrestr CLI tests (reference: tools/editconf.cpp,
gmxpreprocess/genrestr.cpp)."""
import numpy as np

from gromacs_fep_gpu_tpu.cli import main
from gromacs_fep_gpu_tpu.io.groio import read_gro, write_gro


def _mk(tmp):
    names = ["OW", "HW1", "HW2"]
    res = ["SOL"] * 3
    x = np.array([[0.5, 0.5, 0.5], [0.6, 0.5, 0.5], [0.5, 0.6, 0.5]],
                 np.float32)
    write_gro("in.gro", "w", names, res, x,
              np.zeros_like(x), np.diag([1.0, 1.0, 1.0]).astype(np.float32))
    return x


def test_editconf_box_center_convert(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    x = _mk(tmp_path)
    main(["editconf", "-f", "in.gro", "-o", "out.gro", "-box", "3",
          "-c"])
    n, r, xo, vo, box = read_gro("out.gro")
    np.testing.assert_allclose(np.diag(box), 3.0, atol=1e-5)
    # centered: geometric center of extents at box/2
    np.testing.assert_allclose((xo.max(0) + xo.min(0)) / 2, 1.5,
                               atol=1e-3)
    assert vo is not None            # velocities preserved
    # -d margin box
    main(["editconf", "-f", "in.gro", "-o", "d.gro", "-d", "1.0",
          "-novel"])
    _, _, xd, vd, boxd = read_gro("d.gro")
    ext = x.max(0) - x.min(0)
    np.testing.assert_allclose(np.diag(boxd), ext + 2.0, atol=1e-3)
    assert vd is None
    # gro -> pdb conversion via extension
    main(["editconf", "-f", "in.gro", "-o", "out.pdb", "-box", "2"])
    from gromacs_fep_gpu_tpu.io.pdbio import read_pdb
    np_, rp, xp, _, boxp = read_pdb("out.pdb")
    assert np_ == n
    np.testing.assert_allclose(np.diag(boxp), 2.0, atol=1e-4)


def test_editconf_rotate_translate(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _mk(tmp_path)
    main(["editconf", "-f", "in.gro", "-o", "t.gro", "-translate",
          "0.1", "0.2", "0.3"])
    _, _, x0, _, _ = read_gro("in.gro")
    _, _, xt, _, _ = read_gro("t.gro")
    np.testing.assert_allclose(xt - x0, [[0.1, 0.2, 0.3]] * 3, atol=1e-3)
    # rotating 90 deg around z maps +x to +y
    main(["editconf", "-f", "in.gro", "-o", "r.gro", "-rotate",
          "0", "0", "90"])
    _, _, xr, _, _ = read_gro("r.gro")
    d0 = x0[1] - x0[0]               # +x O-H bond
    dr = xr[1] - xr[0]
    np.testing.assert_allclose(dr, [-d0[1], d0[0], d0[2]], atol=1e-3)


def test_genrestr(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _mk(tmp_path)
    main(["genrestr", "-f", "in.gro", "-o", "posre.itp",
          "-fc", "500", "500", "500"])
    txt = open("posre.itp").read()
    assert "[ position_restraints ]" in txt
    rows = [l.split() for l in txt.splitlines()
            if l and not l.startswith((";", "["))]
    # default heavy-atom selection: only the oxygen
    assert len(rows) == 1 and rows[0][0] == "1" and rows[0][2] == "500"
    # explicit selection includes the hydrogens
    main(["genrestr", "-f", "in.gro", "-o", "all.itp", "-sel", "1 2 3"])
    rows = [l.split() for l in open("all.itp").read().splitlines()
            if l and not l.startswith((";", "["))]
    assert [r[0] for r in rows] == ["1", "2", "3"]
