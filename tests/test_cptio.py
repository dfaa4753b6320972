"""GROMACS .cpt checkpoint format tests.

Byte-level layout per fileio/checkpoint.cpp: do_cpt_header (:1095),
doVectorLow records (:719), xdr_int64 high/low split (xdrd.cpp:107),
footer magic (:1294).  No .cpt fixture ships with the reference, so
coverage is (a) field-exact roundtrips, (b) raw-byte header checks
against the spec, (c) the CLI restart surface.
"""
import os
import struct

import numpy as np
import pytest

from gromacs_fep_gpu_tpu.io.cptio import (CPT_MAGIC1, CPT_MAGIC2,
                                          CPT_VERSION, GmxCheckpoint,
                                          is_gmx_cpt, read_gmx_cpt,
                                          write_gmx_cpt)


def _write_demo(path, **kw):
    rng = np.random.default_rng(4)
    n = 17
    x = rng.random((n, 3)).astype(np.float32)
    v = rng.normal(size=(n, 3)).astype(np.float32)
    box = np.diag([2.0, 2.5, 3.0]).astype(np.float32)
    lam = np.linspace(0, 0.6, 7).astype(np.float32)
    write_gmx_cpt(path, x=x, v=v, box=box, lam=lam, fep_state=3,
                  step=12345678901, t=24.691, **kw)
    return x, v, box, lam


def test_roundtrip_core_state(tmp_path):
    p = str(tmp_path / "s.cpt")
    x, v, box, lam = _write_demo(p)
    assert is_gmx_cpt(p)
    cp = read_gmx_cpt(p)
    assert cp.file_version == CPT_VERSION
    assert cp.natoms == 17
    assert cp.step == 12345678901          # int64 survives hi/lo split
    np.testing.assert_allclose(cp.t, 24.691)
    np.testing.assert_array_equal(cp.state["x"], x)
    np.testing.assert_array_equal(cp.state["v"], v)
    np.testing.assert_array_equal(cp.state["box"], box)
    np.testing.assert_array_equal(cp.state["lambda"], lam)
    assert int(cp.state["fep_state"][0]) == 3
    assert cp.output_files == []


def test_roundtrip_coupling_state(tmp_path):
    p = str(tmp_path / "s.cpt")
    xi = np.asarray([0.1, -0.2, 0.3], np.float64)
    _write_demo(p, nosehoover_xi=xi, nosehoover_vxi=2 * xi,
                therm_integral=-7.5, boxv=np.eye(3, dtype=np.float32)
                * 1e-4, baros_integral=0.25)
    cp = read_gmx_cpt(p)
    assert cp.nhchainlength == 3
    np.testing.assert_array_equal(cp.state["nosehoover_xi"], xi)
    np.testing.assert_array_equal(cp.state["nosehoover_vxi"], 2 * xi)
    np.testing.assert_allclose(cp.state["therm_integral"], [-7.5])
    np.testing.assert_allclose(cp.state["boxv"],
                               np.eye(3) * 1e-4, rtol=1e-6)
    np.testing.assert_allclose(cp.state["baros_integral"], [0.25])


def test_header_bytes_match_spec(tmp_path):
    """Raw-byte checks of the XDR layout: magic first, version string as
    an XDR string, footer magic last."""
    p = str(tmp_path / "s.cpt")
    _write_demo(p, version_string="GROMACS 2023.3")
    raw = open(p, "rb").read()
    assert struct.unpack(">i", raw[:4])[0] == CPT_MAGIC1
    # XDR string: [len][bytes padded to 4]
    slen = struct.unpack(">I", raw[4:8])[0]
    assert slen == len("GROMACS 2023.3")
    assert raw[8:8 + slen] == b"GROMACS 2023.3"
    assert struct.unpack(">i", raw[-4:])[0] == CPT_MAGIC2
    # a doVectorLow record for x: [count=3N][XdrDataType::Float=1]
    # somewhere after the header — check the box record (9 floats)
    box = np.diag([2.0, 2.5, 3.0]).astype(">f4").tobytes()
    i = raw.find(box)
    assert i > 0
    count, xdrtype = struct.unpack(">ii", raw[i - 8: i])
    assert count == 9 and xdrtype == 1


def test_rejects_garbage(tmp_path):
    p = str(tmp_path / "bad.cpt")
    open(p, "wb").write(b"\x00" * 64)
    assert not is_gmx_cpt(p)
    with pytest.raises(ValueError):
        read_gmx_cpt(p)


def test_cli_restart_from_gmx_cpt(tmp_path):
    """mdrun writes a .gmx.cpt twin; a new run restarts from it."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_cli import TOP, MDP, make_water_gro
    from gromacs_fep_gpu_tpu.cli import main as cli_main

    os.chdir(tmp_path)
    make_water_gro("conf.gro")
    open("topol.top", "w").write(TOP)
    open("md.mdp", "w").write(MDP)
    cli_main(["grompp", "-f", "md.mdp", "-p", "topol.top", "-c",
              "conf.gro", "-o", "topol.tpz"])
    cli_main(["mdrun", "-s", "topol.tpz", "-deffnm", "md", "-fep",
              "cpu", "-nsteps", "10"])
    assert os.path.exists("md.gmx.cpt")
    cp = read_gmx_cpt("md.gmx.cpt")
    assert cp.step == 10 and cp.natoms == 81
    assert "therm_integral" in cp.state      # v-rescale run
    # check subcommand dumps it
    cli_main(["check", "-s", "md.gmx.cpt"])
    # restart through the GROMACS-format file
    cli_main(["mdrun", "-s", "topol.tpz", "-deffnm", "md2", "-fep",
              "cpu", "-cpi", "md.gmx.cpt", "-nsteps", "5"])
    cp2 = read_gmx_cpt("md2.gmx.cpt")
    assert cp2.step == 15
    # the restarted trajectory starts exactly from the checkpoint state
    np.testing.assert_array_equal(
        np.asarray(read_gmx_cpt("md.gmx.cpt").state["x"]),
        cp.state["x"])