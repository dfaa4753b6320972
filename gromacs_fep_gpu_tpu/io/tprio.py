"""GROMACS .tpr (run-input) reader: header, box, full topology, x/v.

reference: src/gromacs/fileio/tpxio.cpp — do_tpxheader:2722,
do_tpx_state_first:2896, do_mtop:2616 (symtab, ffparams/do_iparams:1802,
moltypes/do_moltype:2535, molblocks, cmap grids, groups),
do_tpx_state_second:2980.  The body is ordered box -> mtop -> x/v ->
inputrec, so everything except the inputrec can be read and the stream
closed before it (the reference reads the ir last for the same
layout reason); run parameters come from an .mdp as usual.

Wire format: XDR — everything 4-byte big-endian (chars/shorts/bools are
serialized as 4-byte ints by the reference's own xdr layer), reals are
4 or 8 bytes per the file's precision field, strings carry two length
words (alloc, used) then NUL-padded bytes.

Supported file versions: 100-129 (GROMACS ~2015-2024 era; older ftype
renumbering below 100 is not implemented).  Unknown interaction types
present in a file raise with the ftype name rather than misparsing.
"""
from __future__ import annotations

import dataclasses
import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# tpx version constants (tpxio.cpp enum tpxv, base 96)
# ---------------------------------------------------------------------------
TPXV = {name: 96 + i for i, name in enumerate([
    "ComputationalElectrophysiology", "Use64BitRandomSeed",
    "RestrictedBendingAndCombinedAngleTorsionPotentials",
    "InteractiveMolecularDynamics", "RemoveObsoleteParameters1",
    "PullCoordTypeGeom", "PullGeomDirRel", "IntermolecularBondeds",
    "CompElWithSwapLayerOffset", "CompElPolyatomicIonsAndMultipleIonTypes",
    "RemoveAdress", "PullCoordNGroup", "RemoveTwinRange",
    "ReplacePullPrintCOM12", "PullExternalPotential",
    "GenericParamsForElectricField", "AcceleratedWeightHistogram",
    "RemoveImplicitSolvation", "PullPrevStepCOMAsReference", "MimicQMMM",
    "PullAverage", "GenericInternalParameters", "VSite2FD", "AddSizeField",
    "StoreNonBondedInteractionExclusionGroup", "VSite1", "MTS",
    "RemovedConstantAcceleration", "TransformationPullCoord",
    "SoftcoreGapsys", "ReaddedConstantAcceleration", "RemoveTholeRfac",
    "RemoveAtomtypes", "EnsembleTemperature"])}

MIN_VERSION = 100
MAX_VERSION = 96 + len(TPXV) - 1          # 129

# F_* interaction-type enum, current ordering (ifunc.h)
FTYPES = [
    "BONDS", "G96BONDS", "MORSE", "CUBICBONDS", "CONNBONDS", "HARMONIC",
    "FENEBONDS", "TABBONDS", "TABBONDSNC", "RESTRBONDS", "ANGLES",
    "G96ANGLES", "RESTRANGLES", "LINEAR_ANGLES", "CROSS_BOND_BONDS",
    "CROSS_BOND_ANGLES", "UREY_BRADLEY", "QUARTIC_ANGLES", "TABANGLES",
    "PDIHS", "RBDIHS", "RESTRDIHS", "CBTDIHS", "FOURDIHS", "IDIHS",
    "PIDIHS", "TABDIHS", "CMAP", "GB12", "GB13", "GB14", "GBPOL",
    "NPSOLVATION", "LJ14", "COUL14", "LJC14_Q", "LJC_PAIRS_NB", "LJ",
    "BHAM", "LJ_LR", "BHAM_LR", "DISPCORR", "COUL_SR", "COUL_LR",
    "RF_EXCL", "COUL_RECIP", "LJ_RECIP", "DPD", "POLARIZATION",
    "WATER_POL", "THOLE_POL", "ANHARM_POL", "POSRES", "FBPOSRES",
    "DISRES", "DISRESVIOL", "ORIRES", "ORIRESDEV", "ANGRES", "ANGRESZ",
    "DIHRES", "DIHRESVIOL", "CONSTR", "CONSTRNC", "SETTLE", "VSITE1",
    "VSITE2", "VSITE2FD", "VSITE3", "VSITE3FD", "VSITE3FAD", "VSITE3OUT",
    "VSITE4FD", "VSITE4FDN", "VSITEN", "COM_PULL", "DENSITYFITTING",
    "EQM", "EPOT", "EKIN", "ETOT", "ECONSERVED", "TEMP", "VTEMP",
    "PDISPCORR", "PRES", "DVDL_CONSTR", "DVDL", "DKDL", "DVDL_COUL",
    "DVDL_VDW", "DVDL_BONDED", "DVDL_RESTRAINT", "DVDL_TEMPERATURE"]
F = {name: i for i, name in enumerate(FTYPES)}
F_NRE = len(FTYPES)

# number of atoms per interaction term (ifunc.cpp nratoms), for the
# ftypes that can appear in ilists
NRAL = {
    "BONDS": 2, "G96BONDS": 2, "MORSE": 2, "CUBICBONDS": 2, "CONNBONDS": 2,
    "HARMONIC": 2, "FENEBONDS": 2, "TABBONDS": 2, "TABBONDSNC": 2,
    "RESTRBONDS": 2, "ANGLES": 3, "G96ANGLES": 3, "RESTRANGLES": 3,
    "LINEAR_ANGLES": 3, "CROSS_BOND_BONDS": 3, "CROSS_BOND_ANGLES": 3,
    "UREY_BRADLEY": 3, "QUARTIC_ANGLES": 3, "TABANGLES": 3, "PDIHS": 4,
    "RBDIHS": 4, "RESTRDIHS": 4, "CBTDIHS": 4, "FOURDIHS": 4, "IDIHS": 4,
    "PIDIHS": 4, "TABDIHS": 4, "CMAP": 5, "LJ14": 2, "LJC14_Q": 2,
    "LJC_PAIRS_NB": 2, "POLARIZATION": 2, "WATER_POL": 5, "THOLE_POL": 4,
    "ANHARM_POL": 2, "POSRES": 1, "FBPOSRES": 1, "DISRES": 2, "ORIRES": 2,
    "ANGRES": 4, "ANGRESZ": 2, "DIHRES": 4, "CONSTR": 2, "CONSTRNC": 2,
    "SETTLE": 3, "VSITE1": 2, "VSITE2": 3, "VSITE2FD": 3, "VSITE3": 4,
    "VSITE3FD": 4, "VSITE3FAD": 4, "VSITE3OUT": 4, "VSITE4FD": 5,
    "VSITE4FDN": 5, "VSITEN": 2,
}

# ftype renumbering table for old files (tpxio.cpp ftupd[]); only the
# entries relevant for versions >= MIN_VERSION matter here
FTUPD = [
    (TPXV["RestrictedBendingAndCombinedAngleTorsionPotentials"],
     F["RESTRANGLES"]),
    (TPXV["RestrictedBendingAndCombinedAngleTorsionPotentials"],
     F["RESTRDIHS"]),
    (TPXV["RestrictedBendingAndCombinedAngleTorsionPotentials"],
     F["CBTDIHS"]),
    (TPXV["VSite1"], F["VSITE1"]),
    (TPXV["VSite2FD"], F["VSITE2FD"]),
    (TPXV["GenericInternalParameters"], F["DENSITYFITTING"]),
]


class XdrReader:
    """Reader for both tpr body encodings.

    mem=False: classic XDR (bodies of tpx < 119 and all headers) —
    4-byte bools/uchars/ushorts, two-length padded strings.
    mem=True: the InMemorySerializer layout used for tpx >= 119 bodies
    (tpxv_AddSizeField, generation >= 27; reference:
    utility/inmemoryserializer.cpp, big-endian-swapped) — natural-width
    bools(1)/uchars(1)/ushorts(2) and u64-length unpadded strings.
    Multi-byte scalars/arrays are big-endian in both."""

    def __init__(self, data: bytes, double: bool = False,
                 mem: bool = False):
        self.d = data
        self.pos = 0
        self.double = double
        self.mem = mem

    def _take(self, n):
        b = self.d[self.pos:self.pos + n]
        if len(b) != n:
            raise IOError("tpr: truncated file")
        self.pos += n
        return b

    def i32(self):
        return struct.unpack(">i", self._take(4))[0]

    def u32(self):
        return struct.unpack(">I", self._take(4))[0]

    def i64(self):
        return struct.unpack(">q", self._take(8))[0]

    def u64(self):
        return struct.unpack(">Q", self._take(8))[0]

    def f32(self):
        return struct.unpack(">f", self._take(4))[0]

    def f64(self):
        return struct.unpack(">d", self._take(8))[0]

    def real(self):
        return self.f64() if self.double else self.f32()

    def bool_(self):
        if self.mem:
            return self._take(1)[0] != 0
        return self.i32() != 0

    def uchar(self):
        if self.mem:
            return self._take(1)[0]
        return self.u32() & 0xff

    def ushort(self):
        if self.mem:
            return struct.unpack(">H", self._take(2))[0]
        return self.u32() & 0xffff

    def ints(self, n):
        return np.frombuffer(self._take(4 * n), ">i4").astype(np.int32)

    def reals(self, n):
        if self.double:
            return np.frombuffer(self._take(8 * n), ">f8").astype(np.float64)
        return np.frombuffer(self._take(4 * n), ">f4").astype(np.float64)

    def uchars(self, n):
        if self.mem:
            return np.frombuffer(self._take(n), np.uint8).copy()
        # xdr_vector of xdr_u_char: each element is a 4-byte word
        return (np.frombuffer(self._take(4 * n), ">u4") & 0xff).astype(
            np.uint8)

    def rvecs(self, n):
        return self.reals(3 * n).reshape(n, 3)

    def string(self):
        if self.mem:
            n = self.u64()
            return self._take(n).decode("utf-8", "replace")
        self.u32()                       # allocated length (len+1)
        n = self.u32()                   # used length
        b = self._take((n + 3) // 4 * 4)
        return b[:n].decode("utf-8", "replace")


@dataclasses.dataclass
class TprMolType:
    name: str
    # per-atom
    m: np.ndarray
    q: np.ndarray
    mB: np.ndarray
    qB: np.ndarray
    type: np.ndarray
    typeB: np.ndarray
    ptype: np.ndarray
    resind: np.ndarray
    atomnames: List[str]
    # interaction lists: ftype name -> (n_terms, 1+nral) int array
    # [param index, atoms...]
    ilists: Dict[str, np.ndarray]
    # exclusions: list of per-atom partner index lists
    excls: List[np.ndarray]


@dataclasses.dataclass
class TprData:
    version: int
    precision: int
    natoms: int
    fep_state: int
    lam: float
    box: np.ndarray                      # (3,3)
    x: Optional[np.ndarray]
    v: Optional[np.ndarray]
    atnr: int                            # number of LJ atom types
    functype: np.ndarray                 # (ntypes,) ftype per param slot
    iparams: List[tuple]                 # raw per-slot parameter tuples
    fudge_qq: float
    reppow: float
    moltypes: List[TprMolType]
    molblocks: List[Tuple[int, int]]     # (moltype index, nmol)
    cmap_grids: Optional[np.ndarray]     # (ngrid, gs, gs) energies
    system_name: str


def _read_iparams(r: XdrReader, ft: int, version: int) -> tuple:
    """One t_iparams record (tpxio.cpp do_iparams); returns raw tuple."""
    name = FTYPES[ft]
    R = r.real
    I = r.i32
    if name in ("ANGLES", "G96ANGLES", "BONDS", "G96BONDS", "HARMONIC",
                "IDIHS"):
        return (R(), R(), R(), R())                  # rA,krA,rB,krB
    if name == "RESTRANGLES":
        return (R(), R())
    if name == "LINEAR_ANGLES":
        return (R(), R(), R(), R())
    if name == "FENEBONDS":
        return (R(), R())
    if name == "RESTRBONDS":
        return tuple(R() for _ in range(8))
    if name in ("TABBONDS", "TABBONDSNC", "TABANGLES", "TABDIHS"):
        return (R(), I(), R())
    if name == "CROSS_BOND_BONDS":
        return (R(), R(), R())
    if name == "CROSS_BOND_ANGLES":
        return (R(), R(), R(), R())
    if name == "UREY_BRADLEY":
        return tuple(R() for _ in range(8))          # version >= 79
    if name == "QUARTIC_ANGLES":
        return (R(),) + tuple(R() for _ in range(5))
    if name == "BHAM":
        return (R(), R(), R())
    if name == "MORSE":
        return tuple(R() for _ in range(6))          # version >= 79
    if name == "CUBICBONDS":
        return (R(), R(), R())
    if name == "CONNBONDS":
        return ()
    if name == "POLARIZATION":
        return (R(),)
    if name == "ANHARM_POL":
        return (R(), R(), R())
    if name == "WATER_POL":
        return tuple(R() for _ in range(6))
    if name == "THOLE_POL":
        out = (R(), R(), R())
        if version < TPXV["RemoveTholeRfac"]:
            R()
        return out
    if name == "LJ":
        return (R(), R())
    if name == "LJ14":
        return (R(), R(), R(), R())
    if name == "LJC14_Q":
        return tuple(R() for _ in range(5))
    if name == "LJC_PAIRS_NB":
        return tuple(R() for _ in range(4))
    if name in ("PDIHS", "PIDIHS", "ANGRES", "ANGRESZ"):
        return (R(), R(), R(), R(), I())
    if name == "RESTRDIHS":
        return (R(), R())
    if name == "DISRES":
        return (I(), I(), R(), R(), R(), R())
    if name == "ORIRES":
        return (I(), I(), I(), R(), R(), R())
    if name == "DIHRES":
        return tuple(R() for _ in range(6))          # version >= 82
    if name == "POSRES":
        return tuple(R() for _ in range(12))         # pos0A fcA pos0B fcB
    if name == "FBPOSRES":
        return (I(), R(), R(), R(), R(), R())        # geom, pos0(3), r, k
    if name == "CBTDIHS":
        return tuple(R() for _ in range(6))
    if name in ("RBDIHS", "FOURDIHS"):
        return tuple(R() for _ in range(12))
    if name in ("CONSTR", "CONSTRNC"):
        return (R(), R())
    if name == "SETTLE":
        return (R(), R())
    if name == "VSITE1":
        return ()
    if name in ("VSITE2", "VSITE2FD"):
        return (R(),)
    if name in ("VSITE3", "VSITE3FD", "VSITE3FAD"):
        return (R(), R())
    if name in ("VSITE3OUT", "VSITE4FD", "VSITE4FDN"):
        return (R(), R(), R())
    if name == "VSITEN":
        return (I(), R())
    if name in ("GB12", "GB13", "GB14"):
        if version < TPXV["RemoveImplicitSolvation"]:
            for _ in range(5):
                R()
        return ()
    if name == "CMAP":
        return (I(), I())
    raise NotImplementedError(f"tpr: interaction type F_{name} "
                              "not supported by this reader")


def _read_ilists(r: XdrReader, version: int) -> Dict[str, np.ndarray]:
    out = {}
    for j in range(F_NRE):
        clear = any(version < fv and j == ft for (fv, ft) in FTUPD)
        if clear:
            continue
        n = r.i32()
        iatoms = r.ints(n)
        name = FTYPES[j]
        if n > 0:
            width = 1 + NRAL.get(name, 0)
            if name not in NRAL:
                raise NotImplementedError(
                    f"tpr: ilist for F_{name} not supported")
            out[name] = iatoms.reshape(-1, width)
    return out


def _read_moltype(r: XdrReader, symtab: List[str], version: int
                  ) -> TprMolType:
    name = symtab[r.i32()]
    nr = r.i32()
    nres = r.i32()
    m = np.zeros(nr)
    q = np.zeros(nr)
    mB = np.zeros(nr)
    qB = np.zeros(nr)
    typ = np.zeros(nr, np.int32)
    typB = np.zeros(nr, np.int32)
    ptype = np.zeros(nr, np.int32)
    resind = np.zeros(nr, np.int32)
    for i in range(nr):
        m[i] = r.real()
        q[i] = r.real()
        mB[i] = r.real()
        qB[i] = r.real()
        typ[i] = r.ushort()
        typB[i] = r.ushort()
        ptype[i] = r.i32()
        resind[i] = r.i32()
        r.i32()                                      # atomic number
    atomnames = [symtab[r.i32()] for _ in range(nr)]
    for _ in range(2 * nr):                          # atomtype names A/B
        r.i32()
    for _ in range(nres):                            # resinfo
        r.i32()                                      # name
        r.i32()                                      # nr
        r.uchar()                                    # insertion code
    ilists = _read_ilists(r, version)
    # obsolete charge-group block
    bnr = r.i32()
    r.ints(bnr + 1)
    # exclusions (ListOfLists)
    nlists = r.i32()
    nelem = r.i32()
    ranges = r.ints(nlists + 1)
    elems = r.ints(nelem)
    excls = [elems[ranges[i]:ranges[i + 1]] for i in range(nlists)]
    return TprMolType(name=name, m=m, q=q, mB=mB, qB=qB, type=typ,
                      typeB=typB, ptype=ptype, resind=resind,
                      atomnames=atomnames, ilists=ilists, excls=excls)


def read_tpr(path: str) -> TprData:
    raw = open(path, "rb").read()
    r = XdrReader(raw)
    tag = r.string()
    if not tag.startswith("VERSION"):
        raise IOError(f"{path}: not a tpr file")
    precision = r.i32()
    if precision not in (4, 8):
        raise IOError(f"{path}: unknown precision {precision}")
    r.double = precision == 8
    version = r.i32()
    if 77 <= version <= 79:
        r.string()
    generation = r.i32()
    if version >= 81:
        r.string()
    if not (MIN_VERSION <= version <= MAX_VERSION):
        raise IOError(f"{path}: tpx version {version} unsupported "
                      f"(this reader handles {MIN_VERSION}-{MAX_VERSION})")
    natoms = r.i32()
    ngtc = r.i32()
    fep_state = r.i32() if version >= 79 else 0
    lam = r.real()
    b_ir = r.bool_()
    b_top = r.bool_()
    b_x = r.bool_()
    b_v = r.bool_()
    b_f = r.bool_()
    b_box = r.bool_()
    if version >= TPXV["AddSizeField"] and generation >= 27:
        body_size = r.i64()
        # the body is an InMemorySerializer blob (written via doOpaque;
        # reference: tpxio.cpp write_tpx_state + doTpxBodyBuffer) — same
        # big-endian scalars but natural-width bools/uchars/ushorts and
        # u64-length strings.  Switch decoding modes for the rest.
        body = r._take(int(body_size))
        r = XdrReader(body, double=r.double, mem=True)

    # --- state first: box ---
    box = np.eye(3)
    if b_box:
        box = r.rvecs(3)
        if version >= 51:
            r.rvecs(3)                               # box_rel
        r.rvecs(3)                                   # boxv
    if ngtc > 0:
        r.reals(ngtc)                                # legacy tcoupl lambdas

    if not b_top:
        raise IOError(f"{path}: no topology in file")

    # --- mtop ---
    nsym = r.i32()
    symtab = [r.string() for _ in range(nsym)]
    sysname = symtab[r.i32()]
    atnr = r.i32()
    ntypes = r.i32()
    functype = r.ints(ntypes).copy()
    if version >= 66:
        reppow = r.f64()
    else:
        reppow = 12.0
    fudge_qq = r.real()
    for k in range(len(functype)):
        for (fv, ft) in FTUPD:
            if version < fv and functype[k] >= ft:
                functype[k] += 1
    iparams = [_read_iparams(r, int(functype[k]), version)
               for k in range(ntypes)]
    nmoltype = r.i32()
    moltypes = [_read_moltype(r, symtab, version) for _ in range(nmoltype)]
    nmolblock = r.i32()
    molblocks = []
    for _ in range(nmolblock):
        mt = r.i32()
        nmol = r.i32()
        r.i32()                                      # natoms per molecule
        npr_a = r.i32()
        if npr_a:
            r.rvecs(npr_a)                           # posres_xA
        npr_b = r.i32()
        if npr_b:
            r.rvecs(npr_b)                           # posres_xB
        molblocks.append((mt, nmol))
    r.i32()                                          # mtop natoms
    if version >= TPXV["IntermolecularBondeds"]:
        if r.bool_():
            raise NotImplementedError(
                "tpr: intermolecular bonded interactions not supported")
    if version < TPXV["RemoveAtomtypes"]:
        n_at = r.i32()
        if version < TPXV["RemoveImplicitSolvation"]:
            r.reals(3 * n_at)
        r.ints(n_at)
        if version >= 60 and version < TPXV["RemoveImplicitSolvation"]:
            r.reals(2 * n_at)
    # cmap grids
    ngrid = r.i32()
    gs = r.i32()
    cmap_grids = None
    if ngrid > 0:
        g = r.reals(4 * gs * gs * ngrid).reshape(ngrid, gs * gs, 4)
        cmap_grids = g[:, :, 0].reshape(ngrid, gs, gs)
    # groups
    for _ in range(10):                              # egcNR == 10 groups
        gn = r.i32()
        r.ints(gn)
    ngrpname = r.i32()
    for _ in range(ngrpname):
        r.i32()
    for _ in range(10):
        gnr = r.i32()
        if gnr:
            r.uchars(gnr)
    if version >= TPXV["StoreNonBondedInteractionExclusionGroup"]:
        nex = r.i64()
        r.ints(int(nex))

    # --- state second: x, v ---
    x = r.rvecs(natoms) if b_x else None
    v = r.rvecs(natoms) if b_v else None

    return TprData(version=version, precision=precision, natoms=natoms,
                   fep_state=fep_state, lam=lam, box=np.asarray(box),
                   x=x, v=v, atnr=atnr, functype=functype,
                   iparams=iparams, fudge_qq=fudge_qq, reppow=reppow,
                   moltypes=moltypes, molblocks=molblocks,
                   cmap_grids=cmap_grids, system_name=sysname)


# ---------------------------------------------------------------------------
# Conversion to the native System
# ---------------------------------------------------------------------------

def tpr_to_system(t: TprData):
    """TprData -> (System, x, v, box).  Maps the mtop interaction lists
    onto the native MoleculeType rows and reuses the standard builder
    (core/topology.py); unsupported interaction types raise by name."""
    import math
    import warnings

    from ..core.topology import MoleculeType, build_system

    # LJ table: the first atnr^2 ffparams slots are the pair table
    nbfp = np.zeros((t.atnr, t.atnr, 2), np.float32)
    for i in range(t.atnr):
        for j in range(t.atnr):
            k = i * t.atnr + j
            if FTYPES[int(t.functype[k])] not in ("LJ", "BHAM"):
                raise IOError("tpr: ffparams LJ block malformed")
            if FTYPES[int(t.functype[k])] == "BHAM":
                raise NotImplementedError("tpr: Buckingham not supported")
            nbfp[i, j] = t.iparams[k][:2]

    mols = []
    for mt in t.moltypes:
        mol = MoleculeType(
            name=mt.name,
            types_a=[int(v) for v in mt.type],
            charges_a=[float(v) for v in mt.q],
            masses_a=[float(v) for v in mt.m],
            types_b=[int(v) for v in mt.typeB],
            charges_b=[float(v) for v in mt.qB],
            masses_b=[float(v) for v in mt.mB],
            nrexcl=0)
        mol.atom_names = list(mt.atomnames)
        # exclusions come explicitly from the file
        for i, part in enumerate(mt.excls):
            for j in part:
                if j > i:
                    mol.extra_exclusions.append((i, int(j)))

        def p(slot):
            return t.iparams[slot]

        for name, rows in mt.ilists.items():
            for row in rows:
                s, at = int(row[0]), tuple(int(a) for a in row[1:])
                pp = p(s)
                if name in ("BONDS", "HARMONIC"):
                    mol.bonds.append((at, (pp[0], pp[1]), (pp[2], pp[3])))
                elif name == "ANGLES":
                    mol.angles.append((at, (pp[0], pp[1]), (pp[2], pp[3])))
                elif name == "UREY_BRADLEY":
                    mol.ub.append((at, tuple(pp[:4]), tuple(pp[4:8])))
                elif name in ("PDIHS", "PIDIHS"):
                    mol.pdihs.append((at, (pp[0], pp[1], float(pp[4])),
                                      (pp[2], pp[3], float(pp[4]))))
                elif name in ("RBDIHS", "FOURDIHS"):
                    mol.rbdihs.append((at, tuple(pp[:6]), tuple(pp[6:12])))
                elif name == "IDIHS":
                    mol.idihs.append((at, (pp[0], pp[1]), (pp[2], pp[3])))
                elif name == "LJ14":
                    qi, qj = float(mt.q[at[0]]), float(mt.q[at[1]])
                    qib, qjb = float(mt.qB[at[0]]), float(mt.qB[at[1]])
                    mol.pairs14.append((at, (qi * qj, pp[0], pp[1]),
                                        (qib * qjb, pp[2], pp[3])))
                elif name == "CONSTR":
                    mol.constraints.append((at[0], at[1], pp[0], pp[1]))
                elif name == "CONSTRNC":
                    # no-exclusion constraints: 5-tuple marker (topology.py)
                    mol.constraints.append((at[0], at[1], pp[0], pp[1],
                                            "nc"))
                elif name == "SETTLE":
                    mol.settles.append((at[0], at[1], at[2], pp[0], pp[1]))
                elif name == "POSRES":
                    mol.posres.append(((at[0],), tuple(pp[0:6]),
                                       tuple(pp[6:12])))
                elif name == "FBPOSRES":
                    # iparams: (geom, pos0(3), r, k)
                    mol.fbposres.append(((at[0],),
                                         (float(pp[0]), pp[1], pp[2],
                                          pp[3], pp[4], pp[5])))
                elif name == "DISRES":
                    mol.disres.append((at, (pp[2], pp[3], pp[4], pp[5],
                                            float(pp[0]))))
                elif name == "DIHRES":
                    mol.dihres.append((at, tuple(pp[:3]), tuple(pp[3:6])))
                elif name == "ANGRES":
                    mol.angres.append((at, (pp[0], pp[1], float(pp[4])),
                                       (pp[2], pp[3], float(pp[4]))))
                elif name == "RESTRBONDS":
                    mol.restrbonds.append((at, tuple(pp[:4]),
                                           tuple(pp[4:8])))
                elif name == "VSITE2":
                    mol.vsites2.append((at, (pp[0],)))
                elif name == "VSITE3":
                    mol.vsites3.append((at, (pp[0], pp[1])))
                elif name == "VSITE3FD":
                    mol.vsites3fd.append((at, (pp[0], pp[1])))
                elif name == "VSITE3FAD":
                    th = math.radians(pp[0])
                    mol.vsites3fad.append((at, (pp[1] * math.cos(th),
                                                pp[1] * math.sin(th))))
                elif name == "VSITE3OUT":
                    mol.vsites3out.append((at, tuple(pp[:3])))
                elif name == "VSITE4FDN":
                    mol.vsites4fdn.append((at, tuple(pp[:3])))
                elif name == "CMAP":
                    mol.cmap.append((at, int(pp[0])))
                elif name == "ORIRES":
                    # iparams: (ex, label, power, c, obs, kfac)
                    mol.orires.append((at, (int(pp[0]), int(pp[1]),
                                            int(pp[2]), pp[3], pp[4],
                                            pp[5])))
                elif name == "CONNBONDS":
                    pass                             # topology-only bonds
                else:
                    raise NotImplementedError(
                        f"tpr: interaction F_{name} not supported")
        mols.append(mol)

    ordered = [(mols[mt], nmol) for (mt, nmol) in t.molblocks]
    system = build_system(ordered, nbfp, fudge_qq=t.fudge_qq,
                          cmap_grids=t.cmap_grids)
    if system.orires is not None and t.x is not None:
        from ..ops.orires import fill_orires_xref
        system = fill_orires_xref(system, t.x)
    return system, t.x, t.v, t.box
