"""Native TRR codec round-trip tests."""
import numpy as np

from gromacs_fep_gpu_tpu.io.trrio import (read_trr_frame, scan_trr,
                                          write_trr_frame)


def test_trr_header_wire_format(tmp_path):
    """Exact on-disk XDR layout of the frame header so GROMACS tools can
    parse it: magic i32(1993), then gmx_fio_do_string = outer i32(strlen+1)
    + xdr_string's u32(strlen) + unpadded bytes (gmxfio_xdr.cpp:388,420)."""
    import struct
    path = str(tmp_path / "one.trr")
    x = np.zeros((2, 3), np.float32)
    write_trr_frame(path, x, np.eye(3, dtype=np.float32))
    raw = open(path, "rb").read()
    magic, slen, inner = struct.unpack(">iII", raw[:12])
    assert magic == 1993
    assert slen == len("GMX_trn_file") + 1
    assert inner == len("GMX_trn_file")
    assert raw[12:24] == b"GMX_trn_file"


def test_trr_roundtrip(tmp_path):
    path = str(tmp_path / "traj.trr")
    rng = np.random.RandomState(0)
    box = np.diag([2.0, 2.5, 3.0]).astype(np.float32)
    frames = []
    for s in range(3):
        x = rng.rand(17, 3).astype(np.float32)
        v = rng.randn(17, 3).astype(np.float32)
        frames.append((x, v))
        write_trr_frame(path, x, box, v=v, step=s * 10, time=s * 0.02,
                        lam=0.25 * s)
    na, nf = scan_trr(path)
    assert (na, nf) == (17, 3)
    for s in range(3):
        fr = read_trr_frame(path, s, na)
        np.testing.assert_allclose(fr["x"], frames[s][0], atol=0)
        np.testing.assert_allclose(fr["v"], frames[s][1], atol=0)
        np.testing.assert_allclose(fr["box"], box, atol=0)
        assert fr["step"] == s * 10
        assert abs(fr["time"] - s * 0.02) < 1e-6
        assert fr["f"] is None
