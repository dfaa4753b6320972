"""trjconv CLI tests (reference: gmxana/gmx_trjconv.cpp)."""
import os

import numpy as np

from gromacs_fep_gpu_tpu.cli import main as cli_main
from gromacs_fep_gpu_tpu.io.trrio import (read_trr_frame, scan_trr,
                                          write_trr_frame)
from gromacs_fep_gpu_tpu.io.xtcio import read_xtc_frame, scan_xtc


def _make_trr(path, n_frames=10, natoms=5):
    rng = np.random.default_rng(0)
    box = np.eye(3, dtype=np.float32) * 3.0
    frames = []
    for i in range(n_frames):
        x = rng.random((natoms, 3)).astype(np.float32) * 4.0 - 0.5
        write_trr_frame(str(path), x, box, step=i * 10, time=i * 0.5)
        frames.append(x)
    return frames, box


def test_trr_to_xtc_with_window(tmp_path):
    src = tmp_path / "in.trr"
    frames, box = _make_trr(src)
    out = str(tmp_path / "out.xtc")
    cli_main(["trjconv", "-f", str(src), "-o", out,
              "-b", "1.0", "-e", "3.0"])
    natoms, nf = scan_xtc(out)
    assert natoms == 5
    assert nf == 5                        # t = 1.0, 1.5, 2.0, 2.5, 3.0
    fr = read_xtc_frame(out, 0, natoms)
    assert fr["time"] == 1.0
    np.testing.assert_allclose(fr["x"], frames[2], atol=2e-3)


def test_skip_and_pbc_atom(tmp_path):
    src = tmp_path / "in.trr"
    frames, box = _make_trr(src)
    out = str(tmp_path / "out.trr")
    cli_main(["trjconv", "-f", str(src), "-o", out, "-skip", "2",
              "-pbc", "atom"])
    natoms, nf = scan_trr(out)
    assert nf == 5
    fr = read_trr_frame(out, 0, natoms)
    x = fr["x"]
    assert (x >= -1e-6).all() and (x <= 3.0 + 1e-6).all()  # wrapped
    # wrapping is modulo the box
    np.testing.assert_allclose(np.mod(frames[0], 3.0), np.mod(x, 3.0),
                               atol=1e-5)


def test_to_multiframe_gro(tmp_path):
    src = tmp_path / "in.trr"
    _make_trr(src, n_frames=3)
    out = str(tmp_path / "out.gro")
    cli_main(["trjconv", "-f", str(src), "-o", out])
    txt = open(out).read()
    assert txt.count("frame t=") == 3
    # each frame: title + natoms + 5 atom lines + box
    assert len(txt.strip().splitlines()) == 3 * (2 + 5 + 1)