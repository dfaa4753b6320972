"""XTC codec tests: byte-exact interop against golden blobs produced by
the reference 3dfcoord implementation (tests/data/xtc_golden.npz), plus
round-trip and multi-frame scanning."""
import os

import numpy as np
import pytest

from gromacs_fep_gpu_tpu.io.xtcio import (read_xtc_frame, scan_xtc,
                                          write_xtc_frame)

DATA = os.path.join(os.path.dirname(__file__), "data", "xtc_golden.npz")
BOX = np.diag([4.0, 4.0, 4.0]).astype(np.float32)

CASES = ["mixed12", "water81", "rand300", "tight50", "tiny8", "neg40"]


@pytest.mark.parametrize("case", CASES)
@pytest.mark.parametrize("prec", [1000, 100])
def test_bitstream_matches_reference(case, prec, tmp_path):
    """The compressed coordinate block must be byte-identical to the
    reference's 3dfcoord output (golden fixture)."""
    d = np.load(DATA)
    x = d[f"{case}_p{prec}_x"]
    golden = d[f"{case}_p{prec}_bytes"].tobytes()
    path = str(tmp_path / "t.xtc")
    write_xtc_frame(path, x, BOX, step=0, time=0.0, precision=float(prec))
    raw = open(path, "rb").read()
    # frame = 16-byte header + 36-byte box + the 3dfcoord block (which
    # itself starts with natoms)
    assert raw[52:] == golden


@pytest.mark.parametrize("case", CASES)
def test_roundtrip(case, tmp_path):
    d = np.load(DATA)
    x = d[f"{case}_p1000_x"]
    path = str(tmp_path / "rt.xtc")
    write_xtc_frame(path, x, BOX, step=7, time=0.25, precision=1000.0)
    na, nf = scan_xtc(path)
    assert (na, nf) == (x.shape[0], 1)
    fr = read_xtc_frame(path, 0, na)
    assert fr["step"] == 7 and abs(fr["time"] - 0.25) < 1e-6
    np.testing.assert_allclose(fr["box"], BOX, atol=1e-6)
    tol = 0.5 / 1000.0 + 1e-6
    if x.shape[0] <= 9:
        tol = 1e-6  # uncompressed float path
    np.testing.assert_allclose(fr["x"], x, atol=tol)


def test_multiframe_scan_and_read(tmp_path):
    rng = np.random.default_rng(3)
    path = str(tmp_path / "m.xtc")
    frames = [rng.uniform(0, 4, (60, 3)).astype(np.float32)
              for _ in range(5)]
    for i, x in enumerate(frames):
        write_xtc_frame(path, x, BOX, step=i * 10, time=i * 0.02)
    na, nf = scan_xtc(path)
    assert (na, nf) == (60, 5)
    for i, x in enumerate(frames):
        fr = read_xtc_frame(path, i, 60)
        assert fr["step"] == i * 10
        np.testing.assert_allclose(fr["x"], x, atol=0.5 / 1000.0 + 1e-6)


REAL_FILES = [
    ("/root/reference/src/gromacs/trajectoryanalysis/tests/freevolume.xtc",
     5540, 1),       # compressed path, real solvated system
    ("/root/reference/src/gromacs/gmxana/tests/msd_traj.xtc", 3, 10),
    ("/root/reference/src/testutils/simulationdatabase/msd_traj.xtc", 3, 10),
]


@pytest.mark.parametrize("path,natoms,nframes", REAL_FILES)
def test_reads_real_gromacs_xtc(path, natoms, nframes):
    """Decode trajectories written by actual GROMACS builds (shipped
    with the reference): covers the compressed 3dfcoord path and the
    <=9-atom uncompressed path on real-world bitstreams."""
    na, nf = scan_xtc(path)
    assert (na, nf) == (natoms, nframes)
    for idx in (0, nf - 1):
        fr = read_xtc_frame(path, idx, na)
        x = fr["x"]
        assert np.isfinite(x).all()
        assert np.abs(x).max() < 100.0          # nm-scale coordinates
        assert np.isfinite(fr["box"]).all()


def test_reads_real_gromacs_trr():
    from gromacs_fep_gpu_tpu.io.trrio import read_trr_frame, scan_trr
    f = ("/root/reference/src/testutils/simulationdatabase/spc2-traj.trr")
    na, nf = scan_trr(f)
    assert (na, nf) == (6, 2)
    fr = read_trr_frame(f, 0, na)
    assert fr["x"].shape == (6, 3) and fr["v"].shape == (6, 3)
    np.testing.assert_allclose(np.diag(fr["box"]), 3.01, rtol=1e-4)
    np.testing.assert_allclose(fr["x"][0], [0.569, 1.275, 1.165],
                               atol=1e-3)
    fr1 = read_trr_frame(f, 1, na)
    np.testing.assert_allclose(np.diag(fr1["box"]), [4.01, 3.03, 9.01],
                               rtol=1e-4)
    assert fr1["step"] == 1 and abs(fr1["time"] - 1.0) < 1e-6
