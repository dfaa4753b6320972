"""PDB codec tests (reference: fileio/pdbio.cpp conventions —
Angstrom<->nm, CRYST1<->box matrix, MODEL frames, column layout)."""
import numpy as np
import pytest

from gromacs_fep_gpu_tpu.io.pdbio import (box_from_cryst1, cryst1_from_box,
                                          parse_pdb, read_pdb,
                                          read_pdb_frames, read_structure,
                                          write_pdb)


def test_cryst1_box_roundtrip_rect_and_triclinic():
    rect = np.diag([2.0, 3.0, 4.0])
    np.testing.assert_allclose(box_from_cryst1(*cryst1_from_box(rect)),
                               rect, atol=1e-9)
    # rhombic dodecahedron xy-square variant (editconf -bt dodecahedron)
    d = 3.0
    tric = np.array([[d, 0, 0],
                     [0, d, 0],
                     [d / 2, d / 2, d * np.sqrt(2) / 2]])
    back = box_from_cryst1(*cryst1_from_box(tric))
    np.testing.assert_allclose(back, tric, atol=1e-7)


def test_pdb_roundtrip(tmp_path):
    p = str(tmp_path / "m.pdb")
    names = ["OW", "HW1", "HW2", "NA"]
    res = ["SOL", "SOL", "SOL", "NA"]
    x = np.array([[0.1, 0.2, 0.3], [0.15, 0.2, 0.3],
                  [0.1, 0.29, 0.3], [1.234, 2.345, 0.001]])
    box = np.diag([2.5, 2.5, 2.5])
    write_pdb(p, "test", names, res, x, box=box, resids=[1, 1, 1, 2])
    n2, r2, x2, v2, b2 = read_pdb(p)
    assert n2 == names and r2 == res and v2 is None
    np.testing.assert_allclose(x2, x, atol=5.1e-5)   # 3 decimals in A
    np.testing.assert_allclose(b2, box, atol=1e-4)
    # coordinates are stored in Angstrom in the file
    txt = open(p).read()
    assert "12.340" in txt and "CRYST1   25.000" in txt


def test_pdb_multimodel(tmp_path):
    p = str(tmp_path / "traj.pdb")
    names, res = ["C"], ["LIG"]
    box = np.eye(3)
    for k in range(3):
        write_pdb(p, "t", names, res, np.array([[0.1 * (k + 1), 0, 0]]),
                  box=box, append_model=k + 1)
    nm, rs, frames, b = read_pdb_frames(p)
    assert nm == names and len(frames) == 3
    np.testing.assert_allclose([f[0, 0] for f in frames], [0.1, 0.2, 0.3],
                               atol=1e-4)
    # model selection
    _, _, x1, _, _ = read_pdb(p, model=1)
    np.testing.assert_allclose(x1[0, 0], 0.2, atol=1e-4)


def test_parse_pdb_hetatm_and_name_columns():
    text = """TITLE t
CRYST1   10.000   10.000   10.000  90.00  90.00  90.00 P 1
ATOM      1  CA  ALA     1       1.000   2.000   3.000  1.00  0.00
ATOM      2 1HH1 ARG     2       4.000   5.000   6.000  1.00  0.00
HETATM    3 FE   HEM     3       7.000   8.000   9.000  1.00  0.00
TER
END
"""
    names, res, x, _, box = parse_pdb(text)
    assert names == ["CA", "1HH1", "FE"]
    assert res == ["ALA", "ARG", "HEM"]
    np.testing.assert_allclose(x[2], [0.7, 0.8, 0.9])
    np.testing.assert_allclose(box, np.eye(3), atol=1e-9)


def test_read_structure_dispatch(tmp_path):
    from gromacs_fep_gpu_tpu.io.groio import write_gro
    g = str(tmp_path / "a.gro")
    p = str(tmp_path / "a.pdb")
    x = np.array([[0.5, 0.6, 0.7]])
    box = np.diag([2.0, 2.0, 2.0])
    write_gro(g, "t", ["OW"], ["SOL"], x, None, box)
    write_pdb(p, "t", ["OW"], ["SOL"], x, box=box)
    for path in (g, p):
        n, r, xx, _, b = read_structure(path)
        assert n == ["OW"] and r == ["SOL"]
        np.testing.assert_allclose(xx, x, atol=1e-4)
        np.testing.assert_allclose(b, box, atol=1e-4)


def test_parse_pdb_empty_raises():
    with pytest.raises(ValueError):
        parse_pdb("TITLE nothing\nEND\n")


REF_PDB = ("/root/reference/src/gromacs/trajectoryanalysis/tests/"
           "clustsize.pdb")


@pytest.mark.skipif(not __import__("os").path.exists(REF_PDB),
                    reason="reference tree not present")
def test_decode_real_gromacs_pdb():
    """Decode a PDB shipped with the reference (water box, chain IDs,
    element columns)."""
    names, res, x, _, box = read_pdb(REF_PDB)
    assert len(names) == 24 and names[0] == "OW" and res[0] == "SOL"
    assert np.all(np.diag(box) > 1.0)
    # water geometry: O-H about 0.1 nm
    doh = np.linalg.norm(x[1] - x[0])
    assert 0.08 < doh < 0.12


def test_cli_make_ndx_and_trjconv_pdb(tmp_path, monkeypatch):
    """make-ndx auto groups + trjconv .pdb output end to end."""
    from gromacs_fep_gpu_tpu.cli import main
    from gromacs_fep_gpu_tpu.io.groio import write_gro
    from gromacs_fep_gpu_tpu.io.ndxio import read_ndx
    from gromacs_fep_gpu_tpu.io.trrio import write_trr_frame

    monkeypatch.chdir(tmp_path)
    names = ["OW", "HW1", "HW2", "NA"]
    res = ["SOL", "SOL", "SOL", "NA"]
    x = np.array([[0.1, 0.1, 0.1], [0.2, 0.1, 0.1],
                  [0.1, 0.2, 0.1], [0.8, 0.8, 0.8]], np.float32)
    box = np.diag([1.5, 1.5, 1.5]).astype(np.float32)
    write_gro("c.gro", "t", names, res, x, None, box)
    main(["make-ndx", "-f", "c.gro", "-o", "index.ndx"])
    g = read_ndx("index.ndx")
    np.testing.assert_array_equal(g["Water"], [0, 1, 2])
    np.testing.assert_array_equal(g["NA"], [3])
    np.testing.assert_array_equal(g["System"], np.arange(4))

    for k in range(2):
        write_trr_frame("tr.trr", x + 0.01 * k, box, step=k,
                        time=0.002 * k)
    main(["trjconv", "-f", "tr.trr", "-o", "out.pdb"])
    nm, rs, frames, b = read_pdb_frames("out.pdb")
    assert len(frames) == 2 and len(nm) == 4
    np.testing.assert_allclose(frames[1] - frames[0], 0.01, atol=1e-3)
