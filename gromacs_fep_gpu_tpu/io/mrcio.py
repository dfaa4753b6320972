"""MRC/CCP4 density-map I/O for density-guided simulation.

Reference: src/gromacs/fileio/mrcserializer.cpp (field order, 1024-byte
header, 'MAP ' format identifier, machine stamp) and
mrcdensitymapheader.cpp:88 getCoordinateTransformationToLattice (cell
lengths stored in Angstrom; lattice scale = extent / (cellLength * 0.1),
translation from columnRowSectionStart or the EMDB origin words 50-52).

Data layout: MODE 2 float32, fastest-varying axis = column, i.e.
data[section][row][column]; with the standard axis order
MAPC,MAPR,MAPS = 1,2,3 that is data[z][y][x] (mrcdensitymapheader.cpp:114
getDynamicExtents3D returns {NZ, NY, NX}).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

_HEADER_BYTES = 1024
_MAP_ID = b"MAP "


@dataclasses.dataclass
class MrcMap:
    """A density map plus the header fields the lattice transform needs.

    data: (nz, ny, nx) float32 voxel values, data[z][y][x].
    cell_length_A: physical extent of the unit cell in Angstrom.
    extent: number of lattice points spanning the cell (MX, MY, MZ).
    start: first column/row/section index (NXSTART, NYSTART, NZSTART).
    origin_A: EMDB-convention origin (words 50-52), Angstrom; all-zero
        means "use start/scale for the translation" as the reference does.
    """
    data: np.ndarray
    cell_length_A: Tuple[float, float, float]
    extent: Tuple[int, int, int]
    start: Tuple[int, int, int] = (0, 0, 0)
    origin_A: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    cell_angles: Tuple[float, float, float] = (90.0, 90.0, 90.0)

    @property
    def grid_shape_xyz(self) -> Tuple[int, int, int]:
        nz, ny, nx = self.data.shape
        return (nx, ny, nz)

    def lattice_transform(self):
        """(scale, translation): x_lattice = scale * (x_nm + translation).

        Mirrors getCoordinateTransformationToLattice
        (mrcdensitymapheader.cpp:88-112): scale[d] = extent[d] /
        (cellLength[d] * 0.1) in lattice points per nm; the translation
        comes from the EMDB origin when set, else from the start indices.
        """
        scale = np.array([self.extent[d] / (self.cell_length_A[d] * 0.1)
                          for d in range(3)], np.float64)
        o = np.asarray(self.origin_A, np.float64)
        if np.all(o == 0.0):
            trans = -np.asarray(self.start, np.float64) / scale
        else:
            trans = -o * 0.1
        return scale.astype(np.float32), trans.astype(np.float32)


def read_mrc(path: str) -> MrcMap:
    with open(path, "rb") as f:
        hdr = f.read(_HEADER_BYTES)
        if len(hdr) < _HEADER_BYTES:
            raise ValueError(f"{path}: truncated MRC header")
        # words 53 (0-based byte 208): format identifier; machine stamp
        # word 54 decides endianness (mrcserializer.cpp:277)
        if hdr[208:212] not in (_MAP_ID, b"MAP\0"):
            raise ValueError(f"{path}: missing 'MAP ' format identifier")
        # Machine stamp (word 54) is unreliable in the wild (often zero);
        # decide endianness by which byte order yields a sane MODE and
        # positive dimensions (the reference's mrcHeaderIsSane approach).
        def _sane(endc):
            w = np.frombuffer(hdr, np.dtype(endc + "i4"), count=10)
            return (0 <= w[3] <= 4 and all(0 < v <= 100_000 for v in w[0:3]))
        if _sane("<"):
            end = "<"
        elif _sane(">"):
            end = ">"
        else:
            machst = hdr[212:216]
            end = "<" if machst[0] in (0x44, 0x00) else ">"
        i4 = np.dtype(end + "i4")
        f4 = np.dtype(end + "f4")
        w_int = np.frombuffer(hdr, i4, count=56)
        w_flt = np.frombuffer(hdr, f4, count=56)
        ncrs = tuple(int(v) for v in w_int[0:3])       # NX NY NZ (col/row/sec)
        mode = int(w_int[3])
        start = tuple(int(v) for v in w_int[4:7])
        extent = tuple(int(v) for v in w_int[7:10])    # MX MY MZ
        cell = tuple(float(v) for v in w_flt[10:13])   # CELLA, Angstrom
        angles = tuple(float(v) for v in w_flt[13:16])
        mapcrs = tuple(int(v) for v in w_int[16:19])
        nsymbt = int(w_int[23])
        origin = tuple(float(v) for v in w_flt[49:52])  # words 50-52
        if mode != 2:
            raise ValueError(f"{path}: only MODE 2 (float32) supported, "
                             f"got {mode}")
        f.seek(_HEADER_BYTES + nsymbt)
        n = ncrs[0] * ncrs[1] * ncrs[2]
        data = np.frombuffer(f.read(4 * n), f4, count=n)
    # data stored [section][row][column]; remap to [z][y][x]
    grid_crs = data.reshape(ncrs[2], ncrs[1], ncrs[0])
    if mapcrs in ((1, 2, 3), (0, 0, 0)):
        grid = grid_crs
        nxyz = ncrs
        start_xyz, extent_xyz, cell_xyz = start, extent, cell
    else:
        axis_of = {v: i for i, v in enumerate(mapcrs)}  # xyz -> crs slot
        if sorted(mapcrs) != [1, 2, 3]:
            raise ValueError(f"{path}: bad MAPC/MAPR/MAPS {mapcrs}")
        # grid_crs axes are (sec, row, col) = crs slots (2, 1, 0)
        perm = tuple(2 - axis_of[ax] for ax in (3, 2, 1))
        grid = np.transpose(grid_crs, perm)
        start_xyz = tuple(start[axis_of[d + 1]] for d in range(3))
        extent_xyz = tuple(extent[d] for d in range(3))
        cell_xyz = tuple(cell[d] for d in range(3))
        nxyz = (grid.shape[2], grid.shape[1], grid.shape[0])
    del nxyz
    return MrcMap(data=np.ascontiguousarray(grid, np.float32),
                  cell_length_A=cell_xyz, extent=extent_xyz,
                  start=start_xyz, origin_A=origin, cell_angles=angles)


def write_mrc(path: str, m: MrcMap):
    nz, ny, nx = m.data.shape
    w_int = np.zeros(256, "<i4")
    w_flt = w_int.view("<f4")
    w_int[0:3] = (nx, ny, nz)
    w_int[3] = 2
    w_int[4:7] = m.start
    w_int[7:10] = m.extent
    w_flt[10:13] = m.cell_length_A
    w_flt[13:16] = m.cell_angles
    w_int[16:19] = (1, 2, 3)
    w_flt[19] = float(m.data.min())
    w_flt[20] = float(m.data.max())
    w_flt[21] = float(m.data.mean())
    w_int[22] = 1                       # ISPG = P1
    w_flt[49:52] = m.origin_A
    hdr = bytearray(w_int.tobytes())
    hdr[208:212] = _MAP_ID
    hdr[212:216] = bytes([0x44, 0x44, 0x00, 0x00])  # little-endian stamp
    w2 = np.frombuffer(bytes(hdr), "<f4").copy()
    w2[54] = float(m.data.std())        # RMS, word 55
    with open(path, "wb") as f:
        f.write(w2.tobytes())
        f.write(np.ascontiguousarray(m.data, "<f4").tobytes())
