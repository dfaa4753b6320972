"""edr energy-file codec tests (format per reference fileio/enxio.cpp;
delta-H blocks per mdlib/mdebin_bar.cpp)."""
import struct

import numpy as np

from gromacs_fep_gpu_tpu.io.edrio import (DHBT_DH, DHBT_DHDL, ENX_DH,
                                          ENX_DHCOLL, EdrFrame, EdrWriter,
                                          MAGIC_FRAME, MAGIC_NMS, XDR_DOUBLE,
                                          XDR_FLOAT, XDR_INT, dh_block,
                                          dhcoll_block, read_edr)

NAMES = ["Potential", "Kinetic En.", "Total Energy", "Temperature",
         "Pressure", "dVcoul/dl"]
UNITS = ["kJ/mol", "kJ/mol", "kJ/mol", "K", "bar", "kJ/mol"]


def test_edr_roundtrip(tmp_path):
    p = str(tmp_path / "e.edr")
    rng = np.random.RandomState(0)
    vals = rng.normal(size=(5, len(NAMES))).astype(np.float32)
    with EdrWriter(p, NAMES, UNITS) as w:
        for i in range(5):
            w.write_frame(EdrFrame(t=0.002 * i, step=i, ener=vals[i]))
    names, units, frames = read_edr(p)
    assert names == NAMES and units == UNITS
    assert len(frames) == 5
    for i, fr in enumerate(frames):
        assert fr.step == i
        np.testing.assert_allclose(fr.t, 0.002 * i)
        np.testing.assert_allclose(fr.ener, vals[i], rtol=1e-6)


def test_edr_wire_format_prefix(tmp_path):
    """Byte-level check of the magics/version the reference reader gates
    on (enxio.cpp:388 names magic -55555, :448 frame magic -7777777)."""
    p = str(tmp_path / "e.edr")
    with EdrWriter(p, ["Potential"], ["kJ/mol"]) as w:
        w.write_frame(EdrFrame(t=1.0, step=7, ener=np.array([-3.5])))
    raw = open(p, "rb").read()
    magic, ver, nre = struct.unpack(">iii", raw[:12])
    assert magic == MAGIC_NMS == -55555 and ver == 5 and nre == 1
    # name string: counted (no terminator), padded to 4
    slen = struct.unpack(">i", raw[12:16])[0]
    assert slen == len("Potential")
    assert raw[16:16 + slen] == b"Potential"
    # frame header starts with real(-2e10) then the frame magic
    off = 16 + (slen + 3) // 4 * 4
    ulen = struct.unpack(">i", raw[off:off + 4])[0]
    off += 4 + (ulen + 3) // 4 * 4
    first, fmagic, fver = struct.unpack(">fii", raw[off:off + 12])
    assert first < -1e10 and fmagic == MAGIC_FRAME == -7777777 and fver == 5
    t, = struct.unpack(">d", raw[off + 12:off + 20])
    assert t == 1.0


def test_edr_dh_blocks_roundtrip(tmp_path):
    """BAR blocks: enxDHCOLL metadata + dhdl and foreign-lambda series
    (mdebin_bar.cpp:216,629 layout)."""
    p = str(tmp_path / "dh.edr")
    dvdl = np.array([0.5, 0.6, 0.7], np.float32)
    dh01 = np.array([-1.0, -1.1, -0.9], np.float32)
    with EdrWriter(p, NAMES, UNITS) as w:
        blocks = [
            dhcoll_block(temperature=300.0, start_time=0.0, delta_time=0.002,
                         start_lambda=-1.0, lambda_index=1,
                         native_lambda_vec=[0.5, 0.5],
                         lambda_components=[2, 3]),
            dh_block(DHBT_DHDL, dvdl, derivative=2),
            dh_block(DHBT_DH, dh01, foreign_lambda=[0.0, 0.0]),
        ]
        w.write_frame(EdrFrame(t=0.0, step=0,
                               ener=np.zeros(len(NAMES), np.float32),
                               blocks=blocks))
    _, _, frames = read_edr(p)
    blks = frames[0].blocks
    assert [b.id for b in blks] == [ENX_DHCOLL, ENX_DH, ENX_DH]
    coll = blks[0]
    assert coll.subs[0][0] == XDR_DOUBLE
    np.testing.assert_allclose(coll.subs[0][1][:5],
                               [300.0, 0.0, 0.002, -1.0, 0.0])
    np.testing.assert_allclose(coll.subs[0][1][5:], [0.5, 0.5])
    assert coll.subs[1][0] == XDR_INT
    assert coll.subs[1][1].tolist() == [1, 2, 2, 3]
    dh = blks[1]
    assert dh.subs[0][1].tolist() == [DHBT_DHDL, 2]
    np.testing.assert_allclose(blks[1].subs[2][1], dvdl, rtol=1e-6)
    np.testing.assert_allclose(blks[2].subs[1][1], [0.0, 0.0])
    np.testing.assert_allclose(blks[2].subs[2][1], dh01, rtol=1e-6)


REAL_EDR = "/root/reference/src/gromacs/energyanalysis/tests"


def test_reads_real_gromacs_edr_single_precision():
    from gromacs_fep_gpu_tpu.io.edrio import read_edr
    names, units, frames = read_edr(f"{REAL_EDR}/ener.edr")
    assert len(names) == 40 and len(frames) == 51
    assert names[0] == "LJ (SR)" and units[0] == "kJ/mol"
    assert frames[0].t == 0.0 and abs(frames[-1].t - 10.0) < 1e-9
    assert all(np.isfinite(fr.ener).all() for fr in frames)


def test_reads_real_gromacs_edr_double_precision_with_dh_blocks():
    """The 2016 double-precision FEP run's energy file: precision is
    auto-detected and the BAR delta-H blocks decode."""
    from gromacs_fep_gpu_tpu.io.edrio import read_edr
    names, units, frames = read_edr(f"{REAL_EDR}/dhdl.edr")
    assert len(frames) == 101
    assert "Coulomb (SR)" in names
    assert abs(frames[-1].t - 1.0) < 1e-9
    # every frame carries the dH collection + series blocks
    assert all(len(fr.blocks) == 9 for fr in frames)
    assert all(np.isfinite(fr.ener).all() for fr in frames)


def test_energy_statistics_on_real_edr():
    from gromacs_fep_gpu_tpu.analysis.energy import energy_statistics
    stats = energy_statistics(f"{REAL_EDR}/ener.edr")
    assert "LJ (SR)" in stats and "Pressure" in " ".join(stats)
    assert np.isfinite(stats["LJ (SR)"]["average"])
