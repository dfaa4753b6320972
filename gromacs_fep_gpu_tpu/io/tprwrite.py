"""GROMACS .tpr (run-input) WRITER — the write_tpx_state analogue
(reference: src/gromacs/fileio/tpxio.cpp:3359 write_tpx_state), closing
the interop loop: systems prepared by this framework's grompp can be
run/validated under reference GROMACS.

Targets tpx **version 118** (GROMACS-2021-era; generation 26), the
newest version whose BODY is still plain XDR: from version 119
(tpxv_AddSizeField, generation 27) the reference serializes the body
with InMemorySerializer (1-byte bools, u64-length strings) and prefixes
a body-size field — reference GROMACS 2021+ reads version-118 files
without complaint (backwards compatibility floor is version 57,
tpxio.cpp tpx_incompatible_version).

The field order mirrors tpxio.cpp exactly at file_version == 118:
do_tpxheader (:2722), do_tpx_state_first (:2896), do_mtop (:2616),
do_tpx_state_second, do_tpx_ir (:3065) + do_inputrec (:1025) +
do_fepvals (:467).  Enum integer values follow
api/legacy/include/gromacs/mdtypes/md_enums.h.

Scope: the flattened `System` is emitted as ONE molecule type / one
molecule block (legal GROMACS topology).  Supported interactions:
LJ nonbonded (geometric or tabulated via explicit per-pair slots),
bonds/angles/UB/proper+RB+improper dihedrals, 1-4 pairs, SETTLE,
pairwise constraints, exclusions, full A/B (FEP) states.  Anything
else present raises by name rather than writing a wrong file.
"""
from __future__ import annotations

import struct
from typing import Dict, List, Optional

import numpy as np

from .tprio import FTYPES, F, NRAL, TPXV

TPX_VERSION = 118
TPX_GENERATION = 26


class XdrWriter:
    def __init__(self):
        self.chunks: List[bytes] = []

    def raw(self, b: bytes):
        self.chunks.append(b)

    def i32(self, v):
        self.raw(struct.pack(">i", int(v)))

    def u32(self, v):
        self.raw(struct.pack(">I", int(v) & 0xffffffff))

    def i64(self, v):
        self.raw(struct.pack(">q", int(v)))

    def f32(self, v):
        self.raw(struct.pack(">f", float(v)))

    def f64(self, v):
        self.raw(struct.pack(">d", float(v)))

    real = f32          # single-precision file

    def bool_(self, v):
        self.i32(1 if v else 0)

    def uchar(self, v):
        self.u32(int(v) & 0xff)

    def ushort(self, v):
        self.u32(int(v) & 0xffff)

    def ints(self, arr):
        self.raw(np.asarray(arr, ">i4").tobytes())

    def reals(self, arr):
        self.raw(np.asarray(arr, ">f4").tobytes())

    def f64s(self, arr):
        self.raw(np.asarray(arr, ">f8").tobytes())

    def rvecs(self, arr):
        self.reals(np.asarray(arr, np.float64).reshape(-1))

    def string(self, s: str):
        b = s.encode("utf-8")
        # xdr string: allocated length (len+1), used length, padded bytes
        self.u32(len(b) + 1)
        self.u32(len(b))
        pad = (-len(b)) % 4
        self.raw(b + b"\x00" * pad)

    def getvalue(self) -> bytes:
        return b"".join(self.chunks)


# ---------------------------------------------------------------------------
# enum integer values (md_enums.h current ordering)
# ---------------------------------------------------------------------------
EI = {"md": 0, "steep": 1, "cg": 2, "bd": 3, "nm": 5, "l-bfgs": 6,
      "tpi": 7, "tpic": 8, "sd": 9, "md-vv": 10, "md-vv-avek": 11}
COULOMB = {"cut-off": 0, "reaction-field": 1, "pme": 3, "ewald": 4}
VDWTYPE = {"cut-off": 0, "switch": 1, "shift": 2, "user": 3, "pme": 5}
MODIFIER = {"potential-shift-verlet": 0, "potential-shift": 1, "none": 2,
            "potential-switch": 3, "exact-cutoff": 4, "force-switch": 5}
TCOUPL = {"no": 0, "berendsen": 1, "nose-hoover": 2, "yes": 3,
          "andersen": 4, "andersen-massive": 5, "v-rescale": 6}
PCOUPL = {"no": 0, "berendsen": 1, "parrinello-rahman": 2, "isotropic": 3,
          "mttk": 4, "c-rescale": 5}
PCOUPLTYPE = {"isotropic": 0, "semiisotropic": 1, "anisotropic": 2,
              "surface-tension": 3}
EDISP = {"no": 0, "enerpres": 1, "ener": 2, "allenerpres": 3, "allener": 4}
EFEP = {"no": 0, "yes": 1, "static": 2, "slow-growth": 3, "expanded": 4}
COMM = {"linear": 0, "angular": 1, "none": 2}


def _iparams_writer(w: XdrWriter, name: str, p):
    """One t_iparams record, mirror of tprio._read_iparams."""
    R = w.real
    I = w.i32
    if name in ("BONDS", "ANGLES", "HARMONIC", "IDIHS", "G96BONDS",
                "G96ANGLES"):
        R(p[0]); R(p[1]); R(p[2]); R(p[3])
    elif name == "UREY_BRADLEY":
        for v in p[:8]:
            R(v)
    elif name == "LJ":
        R(p[0]); R(p[1])
    elif name == "LJ14":
        R(p[0]); R(p[1]); R(p[2]); R(p[3])
    elif name in ("PDIHS", "PIDIHS"):
        R(p[0]); R(p[1]); R(p[2]); R(p[3]); I(p[4])
    elif name in ("RBDIHS", "FOURDIHS"):
        for v in p[:12]:
            R(v)
    elif name in ("CONSTR", "CONSTRNC"):
        R(p[0]); R(p[1])
    elif name == "SETTLE":
        R(p[0]); R(p[1])
    else:
        raise NotImplementedError(f"tpr writer: iparams for F_{name}")


def _write_header(w: XdrWriter, natoms: int, ngtc: int, fep_state: int,
                  lam: float, has_x: bool, has_v: bool):
    w.string("VERSION 2021-tpumd")
    w.i32(4)                       # precision (single)
    w.i32(TPX_VERSION)
    w.i32(TPX_GENERATION)
    w.string("release")            # file tag (version >= 81)
    w.i32(natoms)
    w.i32(ngtc)
    w.i32(fep_state)
    w.real(lam)
    w.bool_(True)                  # bIr
    w.bool_(True)                  # bTop
    w.bool_(has_x)
    w.bool_(has_v)
    w.bool_(False)                 # bF
    w.bool_(True)                  # bBox
    # no body-size field at version < tpxv_AddSizeField


def _write_fepvals(w: XdrWriter, p, all_lambda: Optional[np.ndarray],
                   init_fep_state: int):
    """do_fepvals at version 118 (no Gapsys block)."""
    fep = p.fep
    n_lambda = 0 if all_lambda is None else int(all_lambda.shape[1])
    w.i32(init_fep_state)
    w.f64(fep.init_lambda if n_lambda == 0 else -1.0)
    w.f64(fep.delta_lambda)
    w.i32(n_lambda)
    sep = [False] * 7
    if n_lambda == 0:
        sep[0] = True
    else:
        for g in range(7):
            if not np.allclose(all_lambda[g], all_lambda[0]):
                sep[g] = True
        sep[0] = True
    for g in range(7):
        if n_lambda > 0:
            w.f64s(all_lambda[g])
            for s in sep:
                w.bool_(s)
    w.real(fep.sc_alpha)
    w.i32(fep.sc_power)
    w.real(6.0)                    # sc_r_power
    w.real(fep.sc_sigma)
    w.bool_(fep.sc_coul)
    w.i32(fep.nstdhdl)
    w.i32(0)                       # separate_dhdl_file = yes
    w.i32(0)                       # dhdl_derivatives = yes
    w.i32(0)                       # dh_hist_size
    w.f64(0.1)                     # dh_hist_spacing
    w.i32(0)                       # edHdLPrintEnergy = no
    w.i32(-1)                      # lambda_neighbors (all)


def _write_inputrec(w: XdrWriter, p, natoms: int,
                    all_lambda: Optional[np.ndarray],
                    init_fep_state: int, ref_t: float, nsteps: int):
    """do_inputrec at file_version 118 (tpxio.cpp:1025)."""
    from ..core.types import CoulombType, VdwModifier

    integ = p.integrator.value if hasattr(p.integrator, "value") \
        else str(p.integrator)
    w.i32(EI.get(integ, 0))                        # eI
    w.i64(nsteps)
    w.i64(0)                                       # init_step
    w.i32(0)                                       # simulation_part
    # (no MTS block < tpxv_MTS=122, no ensemble T < 129)
    w.i32(max(p.nstcalcenergy, 1))
    w.i32(0)                                       # cutoff_scheme = Verlet
    w.i32(0)                                       # ns_type (obsolete)
    w.i32(p.nstlist)
    w.i32(0)                                       # ndelta (obsolete)
    w.real(0.05)                                   # rtpi
    w.i32(p.nstcomm)
    w.i32(COMM["linear"] if p.nstcomm > 0 else COMM["none"])
    w.i32(1000)                                    # nstcgsteep
    w.i32(10)                                      # nbfgscorr
    w.i32(1000)                                    # nstlog
    w.i32(0)                                       # nstxout
    w.i32(0)                                       # nstvout
    w.i32(0)                                       # nstfout
    w.i32(max(p.nstcalcenergy, 1))                 # nstenergy
    w.i32(0)                                       # nstxout_compressed
    w.f64(0.0)                                     # init_t
    w.f64(p.dt)
    w.real(1000.0)                                 # x_compression_precision
    w.real(p.verlet_buffer_tolerance
           if getattr(p, "verlet_buffer_tolerance", None) else 0.005)
    w.real(p.rlist)
    coul = {CoulombType.CUTOFF: "cut-off",
            CoulombType.REACTION_FIELD: "reaction-field",
            CoulombType.PME: "pme"}[p.coulomb]
    w.i32(COULOMB[coul])
    w.i32(MODIFIER["potential-shift"])             # coulomb_modifier
    w.real(0.0)                                    # rcoulomb_switch
    w.real(p.rcoulomb)
    vdwt = "pme" if p.vdw_type == "pme" else "cut-off"
    w.i32(VDWTYPE[vdwt])
    vmod = {"potential-shift": "potential-shift",
            "potential-switch": "potential-switch",
            "force-switch": "force-switch",
            "none": "none"}.get(
                p.vdw_modifier.value if hasattr(p.vdw_modifier, "value")
                else str(p.vdw_modifier), "potential-shift")
    w.i32(MODIFIER[vmod])
    w.real(getattr(p, "rvdw_switch", 0.0) or 0.0)
    w.real(p.rvdw)
    w.i32(EDISP["enerpres"] if p.dispcorr else EDISP["no"])
    w.real(p.epsilon_r)
    w.real(getattr(p, "epsilon_rf", 0.0) or 0.0)
    w.real(1.0)                                    # tabext
    w.real(p.fourier_spacing or 0.12)
    grid = p.pme_grid or (0, 0, 0)
    w.i32(grid[0]); w.i32(grid[1]); w.i32(grid[2])
    w.i32(p.pme_order)
    w.real(p.ewald_rtol)
    w.real(getattr(p, "ewald_rtol_lj", 1e-3) or 1e-3)
    w.i32(0)                                       # ewald_geometry 3d
    w.real(0.0)                                    # epsilon_surface
    w.i32(0)                                       # ljpme comb rule geom
    w.bool_(False)                                 # bContinuation
    tc = p.tcoupl.value if hasattr(p.tcoupl, "value") else str(p.tcoupl)
    w.i32(TCOUPL.get(tc, 0))
    w.bool_(False)                                 # bPrintNHChains
    w.i32(p.nsttcouple)
    pc = p.pcoupl.value if hasattr(p.pcoupl, "value") else str(p.pcoupl)
    w.i32(PCOUPL.get(pc, 0))
    w.i32(PCOUPLTYPE.get(getattr(p, "pcoupltype", "isotropic"), 0))
    w.i32(p.nstpcouple)
    w.real(getattr(p, "tau_p", 1.0))
    refp = float(getattr(p, "ref_p", 1.0) or 1.0)
    comp = float(getattr(p, "compressibility", 4.5e-5) or 4.5e-5)
    for i in range(3):                             # ref_p rvecs
        w.rvecs([[refp if j == i else 0.0 for j in range(3)]])
    for i in range(3):                             # compress rvecs
        w.rvecs([[comp if j == i else 0.0 for j in range(3)]])
    w.i32(0)                                       # refcoord_scaling = no
    w.rvecs([[0.0, 0.0, 0.0]])                     # posres_com
    w.rvecs([[0.0, 0.0, 0.0]])                     # posres_comB
    w.real(1e-4)                                   # shake_tol
    if all_lambda is not None:
        efep = "expanded" if p.expanded is not None else "static"
    elif p.fep.enabled:
        efep = "slow-growth" if p.fep.delta_lambda != 0.0 else "static"
    else:
        efep = "no"
    w.i32(EFEP[efep])
    _write_fepvals(w, p, all_lambda, init_fep_state)
    w.bool_(False)                                 # bSimTemp
    if p.expanded is not None:
        raise NotImplementedError(
            "tpr writer: expanded-ensemble blocks not supported yet")
    w.bool_(False)                                 # bExpanded
    w.i32(0)                                       # eDisre none
    w.i32(0)                                       # eDisreWeighting
    w.bool_(False)                                 # bDisreMixed
    w.real(getattr(p, "disre_fc", 1000.0))
    w.real(0.0)                                    # dr_tau
    w.i32(100)                                     # nstdisreout
    w.real(getattr(p, "orires_fc", 0.0))
    w.real(0.0)                                    # orires_tau
    w.i32(100)                                     # nstorireout
    w.real(0.01)                                   # em_stepsize
    w.real(10.0)                                   # em_tol
    w.bool_(False)                                 # bShakeSOR
    w.i32(20)                                      # niter
    w.real(0.0)                                    # fc_stepsize
    w.i32(0)                                       # eConstrAlg = lincs
    w.i32(4)                                       # nProjOrder
    w.real(30.0)                                   # LincsWarnAngle
    w.i32(1)                                       # nLincsIter
    w.real(0.0)                                    # bd_fric
    w.i64(getattr(p, "seed", 1993) or 1993)        # ld_seed
    for _ in range(3):
        w.rvecs([[0.0, 0.0, 0.0]])                 # deform
    w.real(0.0)                                    # cos_accel
    for _ in range(4):
        w.i32(0)                                   # userints
    for _ in range(4):
        w.real(0.0)                                # userreals
    w.bool_(False)                                 # bPull
    w.bool_(False)                                 # bDoAwh
    w.bool_(False)                                 # bRot
    w.bool_(False)                                 # bIMD
    # t_grpopts
    w.i32(1)                                       # ngtc
    w.i32(getattr(p, "nhchainlength", 10) or 10)   # nhchainlength
    w.i32(0)                                       # ngacc
    w.i32(0)                                       # ngfrz
    w.i32(1)                                       # ngener
    ndf = max(3.0 * natoms - 3.0, 1.0)
    w.reals([ndf])                                 # nrdf
    w.reals([ref_t])                               # ref_t
    w.reals([getattr(p, "tau_t", 0.1) or 0.1])     # tau_t
    w.ints([0])                                    # egp_flags (1x1)
    w.i32(0)                                       # annealing enum (no)
    w.ints([0])                                    # anneal_npoints
    # walls
    w.i32(0)                                       # nwall
    w.i32(0)                                       # wall_type
    w.real(-1.0)                                   # wall_r_linpot
    w.i32(-1); w.i32(-1)                           # wall_atomtype
    w.real(0.0); w.real(0.0)                       # wall_density
    w.real(3.0)                                    # wall_ewald_zfac
    w.i32(0)                                       # eSwapCoords = no
    w.bool_(False)                                 # bQMMM
    w.i32(0)                                       # qmmm scheme
    w.real(1.0)                                    # unused scale factor
    w.i32(0)                                       # ngQM
    w.i32(0)                                       # params KVT: empty object
    w.i32(0)                                       # internalParameters KVT


def write_tpr(path: str, system, params, x, v, box,
              name: str = "tpumd system",
              all_lambda: Optional[np.ndarray] = None,
              init_fep_state: int = -1,
              nsteps: int = 0,
              ref_t: Optional[float] = None):
    """Write a reference-readable .tpr of the flattened System.

    all_lambda: optional (7, n_lambda) per-component ladder.
    Reference readers consume this file via read_tpx_state
    (tpxio.cpp:3425); our own tprio.read_tpr round-trips it too."""
    import jax.numpy as jnp  # noqa: F401  (System fields may be jnp)
    sysname = name
    n = system.n_atoms
    qa = np.asarray(system.charge_a, np.float64)
    qb = np.asarray(system.charge_b, np.float64)
    ta = np.asarray(system.type_a, np.int64)
    tb = np.asarray(system.type_b, np.int64)
    ma = np.asarray(system.mass_a, np.float64)
    mb = np.asarray(system.mass_b, np.float64)
    nbfp = np.asarray(system.nbfp, np.float64)
    atnr = nbfp.shape[0]
    if system.cmap is not None and getattr(system.cmap, "n", 0) > 0:
        raise NotImplementedError("tpr writer: CMAP not supported yet")
    if system.vsites is not None and any(
            np.asarray(il.atoms).shape[0] > 0
            for il in (system.vsites or ())) if isinstance(
                system.vsites, (list, tuple)) else False:
        raise NotImplementedError("tpr writer: virtual sites")

    # ---- build ffparams: atnr^2 LJ slots + one slot per interaction ----
    functype: List[int] = []
    iparams: List = []
    for i in range(atnr):
        for j in range(atnr):
            functype.append(F["LJ"])
            iparams.append((nbfp[i, j, 0], nbfp[i, j, 1]))

    ilists: Dict[str, List[List[int]]] = {}

    def add_il(ftname: str, atoms_rows, params_rows):
        lst = ilists.setdefault(ftname, [])
        for at, pr in zip(atoms_rows, params_rows):
            functype.append(F[ftname])
            iparams.append(tuple(pr))
            lst.append([len(functype) - 1] + [int(a) for a in at])

    def il_rows(il):
        m = np.asarray(il.mask) > 0
        return (np.asarray(il.atoms)[m], np.asarray(il.params_a)[m],
                np.asarray(il.params_b)[m])

    FT_MAP = {
        "bonds": ("BONDS",
                  lambda a, b: (a[0], a[1], b[0], b[1])),
        "angles": ("ANGLES",
                   lambda a, b: (a[0], a[1], b[0], b[1])),
        "ub": ("UREY_BRADLEY",
               lambda a, b: (a[0], a[1], a[2], a[3], b[0], b[1], b[2],
                             b[3])),
        "pdihs": ("PDIHS",
                  lambda a, b: (a[0], a[1], b[0], b[1], int(a[2]))),
        "rbdihs": ("RBDIHS",
                   lambda a, b: tuple(a[:6]) + tuple(b[:6])),
        "idihs": ("IDIHS",
                  lambda a, b: (a[0], a[1], b[0], b[1])),
    }
    for nm, il in system.bonded.items():
        at, pa, pb = il_rows(il)
        if at.shape[0] == 0:
            continue
        if nm not in FT_MAP:
            raise NotImplementedError(f"tpr writer: bonded term '{nm}'")
        ftname, conv = FT_MAP[nm]
        add_il(ftname, at, [conv(a, b) for a, b in zip(pa, pb)])

    at, pa, pb = il_rows(system.pairs14)
    if at.shape[0] > 0:
        # pairs14 params: (qq, c6, c12) per state; LJ14 slots carry
        # (c6A, c12A, c6B, c12B); GROMACS recomputes qq = fudgeQQ qi qj.
        # Infer fudgeQQ from the stored qq of the first pair with qi*qj!=0.
        fudge = 0.5
        qprod = qa[at[:, 0]] * qa[at[:, 1]]
        nz = np.nonzero(np.abs(qprod) > 1e-12)[0]
        if nz.size:
            fudge = float(pa[nz[0], 0] / qprod[nz[0]])
        add_il("LJ14", at,
               [(a[1], a[2], b[1], b[2]) for a, b in zip(pa, pb)])
    else:
        fudge = 0.5

    sat = np.asarray(system.settle.atoms)
    sm = np.asarray(system.settle.mask) > 0
    if sat.shape[0] and sm.any():
        doh = np.asarray(system.settle.d_oh)[sm]
        dhh = np.asarray(system.settle.d_hh)[sm]
        add_il("SETTLE", sat[sm], [(o, h) for o, h in zip(doh, dhh)])
    lat = np.asarray(system.lincs.atoms)
    lm = np.asarray(system.lincs.mask) > 0
    if lat.shape[0] and lm.any():
        la = np.asarray(system.lincs.length_a)[lm]
        lb = np.asarray(system.lincs.length_b)[lm]
        add_il("CONSTR", lat[lm], [(a, b) for a, b in zip(la, lb)])

    # ---- symbol table ----
    symtab = [sysname, "MOL", "A", "RES", "System"]
    SYS_IDX, MOL_IDX, ATOM_IDX, RES_IDX, GRP_IDX = 0, 1, 2, 3, 4

    w = XdrWriter()
    lam0 = 0.0
    _write_header(w, n, 1, init_fep_state, lam0,
                  x is not None, v is not None)

    # ---- state first: box ----
    box = np.asarray(box, np.float64).reshape(3, 3)
    w.rvecs(box)
    w.rvecs(box)                   # box_rel
    w.rvecs(np.zeros((3, 3)))      # boxv
    w.reals([0.0])                 # ngtc legacy lambdas

    # ---- mtop ----
    w.i32(len(symtab))
    for s in symtab:
        w.string(s)
    w.i32(SYS_IDX)
    w.i32(atnr)
    w.i32(len(functype))
    w.ints(functype)
    w.f64(12.0)                    # reppow
    w.real(fudge)                  # fudgeQQ
    for ft, pr in zip(functype, iparams):
        _iparams_writer(w, FTYPES[ft], pr)
    # one molecule type
    w.i32(1)
    w.i32(MOL_IDX)                 # name
    w.i32(n)                       # atoms
    w.i32(1)                       # nres
    for i in range(n):
        w.real(ma[i]); w.real(qa[i]); w.real(mb[i]); w.real(qb[i])
        w.ushort(ta[i]); w.ushort(tb[i])
        w.i32(0)                   # ptype = atom
        w.i32(0)                   # resind
        w.i32(0)                   # atomic number (unknown)
    for _ in range(n):
        w.i32(ATOM_IDX)            # atom names
    for _ in range(2 * n):
        w.i32(ATOM_IDX)            # atomtype names A/B
    w.i32(RES_IDX)                 # resinfo: name
    w.i32(1)                       # residue number
    w.uchar(ord(" "))              # insertion code
    # ilists in ftype order, honoring version-118 FTUPD skips
    for j in range(len(FTYPES)):
        nm = FTYPES[j]
        skip = ((nm == "VSITE1" and TPX_VERSION < TPXV["VSite1"])
                or (nm == "VSITE2FD" and TPX_VERSION < TPXV["VSite2FD"])
                or (nm == "DENSITYFITTING"
                    and TPX_VERSION < TPXV["GenericInternalParameters"])
                or (nm in ("RESTRANGLES", "RESTRDIHS", "CBTDIHS")
                    and TPX_VERSION < TPXV[
                        "RestrictedBendingAndCombinedAngleTorsionPotentials"]))
        if skip:
            continue
        rows = ilists.get(nm, [])
        flat = [v for row in rows for v in row]
        w.i32(len(flat))
        w.ints(flat)
    # obsolete charge groups: one group spanning all atoms
    w.i32(1)
    w.ints([0, n])
    # exclusions (ListOfLists)
    ex = np.asarray(system.exclusions.idx)
    lists = [ex[i][ex[i] >= 0] for i in range(n)]
    ranges = np.zeros(n + 1, np.int64)
    for i, li in enumerate(lists):
        ranges[i + 1] = ranges[i] + len(li)
    w.i32(n)
    w.i32(int(ranges[-1]))
    w.ints(ranges)
    w.ints(np.concatenate(lists) if ranges[-1] else np.zeros(0, np.int64))
    # molblocks
    w.i32(1)
    w.i32(0)                       # moltype index
    w.i32(1)                       # nmol
    w.i32(n)                       # atoms per molecule
    w.i32(0)                       # posres_xA
    w.i32(0)                       # posres_xB
    w.i32(n)                       # mtop natoms
    w.bool_(False)                 # intermolecular bondeds
    # atomtypes block (version < RemoveAtomtypes)
    w.i32(atnr)
    w.ints([-1] * atnr)            # atom numbers unknown
    # cmap
    w.i32(0)                       # ngrid
    w.i32(0)                       # grid spacing
    # groups: 10 classes, each with one group 0; grpnr = 0 (all atoms)
    for _ in range(10):
        w.i32(1)
        w.ints([0])
    w.i32(1)                       # ngrpname
    w.i32(GRP_IDX)
    for _ in range(10):
        w.i32(0)                   # gnr == 0 -> every atom in group 0

    # ---- state second: x, v ----
    if x is not None:
        w.rvecs(np.asarray(x, np.float64))
    if v is not None:
        w.rvecs(np.asarray(v, np.float64))

    # ---- ir ----
    w.i32(0)                       # pbcType = xyz
    w.bool_(False)                 # periodic molecules
    _write_inputrec(w, params, n, all_lambda, init_fep_state,
                    ref_t if ref_t is not None
                    else (getattr(params, "ref_t", 300.0) or 300.0),
                    nsteps)

    with open(path, "wb") as fh:
        fh.write(w.getvalue())
