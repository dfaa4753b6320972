"""Core data model: System (topology+parameters), State, MdParams.

This is the TPU-native replacement for the reference's gmx_mtop_t /
t_inputrec / t_state triple (reference: src/gromacs/topology/topology.h,
api/legacy/include/gromacs/mdtypes/inputrec.h, mdtypes/state.h).  Instead
of a molecule-block object graph we store flat, fixed-shape device arrays:
every interaction class is a padded array of atom-index tuples plus A/B
parameter rows, so the whole system is one pytree that jit/vmap/shard_map
can move and shard.
"""
from __future__ import annotations

import dataclasses
import enum
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


class CoulombType(enum.Enum):
    CUTOFF = "cutoff"
    REACTION_FIELD = "reaction-field"
    PME = "pme"


class VdwModifier(enum.Enum):
    NONE = "none"
    POTENTIAL_SHIFT = "potential-shift"
    POTENTIAL_SWITCH = "potential-switch"
    FORCE_SWITCH = "force-switch"


class SoftcoreType(enum.Enum):
    BEUTLER = "beutler"
    GAPSYS = "gapsys"


class IntegratorType(enum.Enum):
    MD = "md"            # leapfrog
    MD_VV = "md-vv"      # velocity verlet
    SD = "sd"            # Langevin (GROMACS sd)
    BD = "bd"            # Brownian dynamics
    STEEP = "steep"
    CG = "cg"
    LBFGS = "l-bfgs"
    NM = "nm"            # normal-mode analysis
    TPI = "tpi"          # test-particle insertion (requires -rerun)


class TcouplType(enum.Enum):
    NO = "no"
    BERENDSEN = "berendsen"
    V_RESCALE = "v-rescale"
    NOSE_HOOVER = "nose-hoover"
    ANDERSEN_MASSIVE = "andersen-massive"


class PcouplType(enum.Enum):
    NO = "no"
    MTTK = "mttk"
    BERENDSEN = "berendsen"
    C_RESCALE = "c-rescale"
    PARRINELLO_RAHMAN = "parrinello-rahman"


class FepCoupling(enum.IntEnum):
    """Per-component lambda channels
    (reference: mdtypes/md_enums.h:497-508 FreeEnergyPerturbationCouplingType)."""
    FEP = 0
    MASS = 1
    COUL = 2
    VDW = 3
    BONDED = 4
    RESTRAINT = 5
    TEMPERATURE = 6
    COUNT = 7


# ---------------------------------------------------------------------------
# Interaction lists
# ---------------------------------------------------------------------------

@struct.dataclass
class InteractionList:
    """Padded list of k-body interactions of one function type.

    atoms:    (n, k) int32, padded rows repeat index 0 with mask=0
    params_a: (n, p) float32 end-state-A parameters
    params_b: (n, p) float32 end-state-B parameters
    mask:     (n,)  float32 1.0 for real rows, 0.0 for padding
    """
    atoms: Array
    params_a: Array
    params_b: Array
    mask: Array

    @property
    def n(self) -> int:
        return self.atoms.shape[0]

    @staticmethod
    def empty(k: int, p: int) -> "InteractionList":
        return InteractionList(
            atoms=jnp.zeros((0, k), jnp.int32),
            params_a=jnp.zeros((0, p), jnp.float32),
            params_b=jnp.zeros((0, p), jnp.float32),
            mask=jnp.zeros((0,), jnp.float32),
        )


@struct.dataclass
class Exclusions:
    """Per-atom padded exclusion lists (reference: topology/exclusionblocks).

    idx: (N, max_excl) int32 excluded partner indices, padded with -1.
    """
    idx: Array

    @property
    def max_excl(self) -> int:
        return self.idx.shape[1]


@struct.dataclass
class VirtualSites:
    """Massless interaction sites constructed from real atoms
    (reference: mdlib/vsite.cpp construction table :906).

    atoms: (n, 5) int32 = (site, i, j, k, l); unused trailing atoms = i.
    params: (n, 3) = (a, b, c); kind: (n,) int32 — 2=vsite2, 3=vsite3
    in-plane, 4=vsite3out, 5=vsite3fd, 6=vsite3fad (a=d cos(theta),
    b=d sin(theta)), 7=vsite4fdn; mask: (n,).
    """
    atoms: Array
    params: Array
    kind: Array
    mask: Array

    @staticmethod
    def empty() -> "VirtualSites":
        return VirtualSites(atoms=jnp.zeros((0, 5), jnp.int32),
                            params=jnp.zeros((0, 3), jnp.float32),
                            kind=jnp.zeros((0,), jnp.int32),
                            mask=jnp.zeros((0,), jnp.float32))


@struct.dataclass
class CmapList:
    """CHARMM CMAP cross-term dihedral corrections
    (reference: listed_forces/bonded.cpp cmap_dihs; tables from
    gmxpreprocess/toppush.cpp push_cmaptype).

    atoms:  (n, 5) int32 — phi = d(1,2,3,4), psi = d(2,3,4,5)
    typ:    (n,)  int32 grid-type index
    mask:   (n,)  float32
    tables: (T, 4, gs, gs) float32 — V, dV/dphi, dV/dpsi, d2V/dphidpsi
            on the periodic grid (ops/cmap.py precompute_cmap_tables)
    """
    atoms: Array
    typ: Array
    mask: Array
    tables: Array

    @property
    def n(self) -> int:
        return self.atoms.shape[0]

    @staticmethod
    def empty() -> "CmapList":
        return CmapList(atoms=jnp.zeros((0, 5), jnp.int32),
                        typ=jnp.zeros((0,), jnp.int32),
                        mask=jnp.zeros((0,), jnp.float32),
                        tables=jnp.zeros((1, 4, 4, 4), jnp.float32))


@struct.dataclass
class ShellList:
    """Polarizable-shell particles (reference: mdrun/shellfc.cpp t_shell).

    idx: (S,) int32 shell atom indices (mass 0 — frozen by the
    integrator, moved only by the SCF relaxation, md/shellfc.py);
    core: (S,) int32 attached nucleus; k: (S,) spring constant
    q_shell^2 * ONE_4PI_EPS0 / alpha (bonded.cpp:734)."""
    idx: Array
    core: Array
    k: Array


@struct.dataclass
class SettleGroups:
    """Rigid 3-site water constraint groups (reference: mdlib/settle.cpp).

    atoms: (n, 3) int32 (O, H1, H2); d_oh/d_hh: target distances; mask (n,).
    """
    atoms: Array
    d_oh: Array
    d_hh: Array
    mask: Array

    @staticmethod
    def empty() -> "SettleGroups":
        z = jnp.zeros((0,), jnp.float32)
        return SettleGroups(atoms=jnp.zeros((0, 3), jnp.int32), d_oh=z, d_hh=z, mask=z)


@struct.dataclass
class LincsConstraints:
    """Pairwise holonomic constraints solved with LINCS
    (reference: mdlib/lincs.cpp).  length_a/b allow FEP-perturbed lengths.
    """
    atoms: Array      # (n, 2) int32
    length_a: Array   # (n,)
    length_b: Array   # (n,)
    mask: Array       # (n,)

    @staticmethod
    def empty() -> "LincsConstraints":
        z = jnp.zeros((0,), jnp.float32)
        return LincsConstraints(atoms=jnp.zeros((0, 2), jnp.int32), length_a=z,
                                length_b=z, mask=z)


# ---------------------------------------------------------------------------
# System
# ---------------------------------------------------------------------------

@struct.dataclass
class System:
    """Everything static about the simulated system (topology + parameters).

    Nonbonded: atom types index into nbfp, an (T, T, 2) table of (c6, c12)
    in kJ/mol nm^6 / nm^12 (reference: nbnxm/atomdata.h nbfp).  A/B columns
    carry the FEP end states (reference fork: atomdata.h:204-216).
    """
    # per-atom
    charge_a: Array        # (N,)
    charge_b: Array        # (N,)
    type_a: Array          # (N,) int32
    type_b: Array          # (N,) int32
    mass_a: Array          # (N,)
    mass_b: Array          # (N,)
    perturbed: Array       # (N,) bool — atom has A!=B in q/type/mass

    # LJ parameter table
    nbfp: Array            # (T, T, 2) c6, c12

    exclusions: Exclusions

    # bonded interactions, keyed by ftype name:
    # 'bonds' k=2 p=2 (b0, kb); 'angles' k=3 p=2 (th0(deg), kth);
    # 'ub' k=3 p=4; 'pdihs' k=4 p=3 (phi0, kphi, mult);
    # 'rbdihs' k=4 p=6; 'idihs' k=4 p=2; 'pairs14' k=2 p=0 (uses fudge+types)
    bonded: Dict[str, InteractionList]

    # 1-4 pair interactions carry their own explicit parameters
    # (qq = fudgeQQ*qi*qj precomputed, c6, c12 per state)
    pairs14: InteractionList     # k=2, p=3: (qq, c6, c12)

    settle: SettleGroups
    lincs: LincsConstraints
    vsites: VirtualSites = None
    # CHARMM CMAP cross terms; None when the topology has none
    cmap: Optional[CmapList] = None
    # orientation restraints (ops/orires.py OriresList); None when absent
    orires: Optional[Any] = None
    # polarizable-shell particles (md/shellfc.py); None when absent.
    # The harmonic core-shell springs are ALSO materialized as ordinary
    # `bonds` rows (b0 = 0), so forces/energies need no extra kernel —
    # this struct only drives the pre-step SCF relaxation
    # (reference: mdrun/shellfc.cpp t_shell, listed_forces/bonded.cpp:709)
    shells: Optional["ShellList"] = None

    # FEP perturbed-pair list metadata filled by the pairlist machinery is
    # dynamic; but the set of perturbed atoms is static:
    n_atoms: int = struct.field(pytree_node=False, default=0)

    @property
    def n_types(self) -> int:
        return self.nbfp.shape[0]


# ---------------------------------------------------------------------------
# FEP / lambda configuration
# ---------------------------------------------------------------------------

@struct.dataclass
class FepLambdas:
    """all_lambda: (COUNT, n_lambda) per-component lambda schedules
    (reference: mdtypes/inputrec.h t_lambda::all_lambda)."""
    all_lambda: Array   # (7, n_lambda)

    @property
    def n_lambda(self) -> int:
        return self.all_lambda.shape[1]


@dataclasses.dataclass(frozen=True)
class FepParams:
    """Static FEP settings (reference: t_lambda, inputrec.h:114-166)."""
    enabled: bool = False
    init_lambda_state: int = -1        # index into all_lambda (-1 = unset)
    init_lambda: float = -1.0          # scalar lambda (-1 = unset)
    delta_lambda: float = 0.0          # slow growth d(lambda)/d(step)
    sc_alpha: float = 0.0
    sc_power: int = 1                  # 1 or 2
    sc_sigma: float = 0.3
    sc_sigma_min: float = 0.3
    sc_coul: bool = False              # soft-core on coulomb
    softcore: SoftcoreType = SoftcoreType.BEUTLER
    nstdhdl: int = 100
    calc_foreign: bool = True          # compute all foreign-lambda energies
    calc_lambda_neighbors: int = -1    # -1 = all, n = +-n neighbors
    # Gapsys parameters
    sc_gapsys_scale_linpoint_lj: float = 0.85
    sc_gapsys_scale_linpoint_q: float = 0.3
    sc_gapsys_sigma_lj: float = 0.3


@dataclasses.dataclass(frozen=True)
class ExpandedParams:
    """Expanded-ensemble / simulated-tempering MC settings
    (reference: mdtypes/inputrec.h t_expanded + t_simtemp;
    readir.cpp:2590-2640)."""
    nstexpanded: int = 100
    lmc_stats: str = "no"              # no | wang-landau
    lmc_move: str = "no"               # gibbs | metropolized-gibbs | metropolis | barker
    lmc_seed: int = -1
    wl_scale: float = 0.8
    wl_ratio: float = 0.8
    init_wl_delta: float = 1.0
    weight_equil_wl_delta: float = -1.0
    mc_temp: float = -1.0              # defaults to ref_t
    sim_temp: bool = False
    sim_temp_low: float = 300.0
    sim_temp_high: float = 300.0
    sim_temp_scale: str = "geometric"


@dataclasses.dataclass(frozen=True)
class AwhParams:
    """Static AWH settings with the FEP lambda state as the reaction
    coordinate (reference: mdtypes/awh_params.h; mdp keys awh-*,
    awh1-dim1-coord-provider = fep-lambda)."""
    nstsample: int = 10            # awh-nstsample: steps between samples
    n_samples_update: int = 10     # awh-nsamples-update
    error_init: float = 10.0       # awh1-error-init, kJ/mol
    growth_factor: float = 3.0     # awh1-growth-factor (initial stage)
    growth: str = "exp-linear"     # awh1-growth: exp-linear | linear
    target: str = "constant"       # awh1-target (uniform only)
    seed: int = 93                 # awh-seed
    share: bool = False            # awh-share-multisim (ensemble axis)
    # continuous pull-coordinate provider (reference: awh1-dim1-coord-
    # provider = pull; awh.cpp Awh::applyBiasForcesAndUpdateBias)
    coord_provider: str = "fep-lambda"   # fep-lambda | pull
    pull_coord: int = 1            # awh1-dim1-coord-index (1-based)
    coord_min: float = 0.0         # awh1-dim1-start (nm)
    coord_max: float = 1.0         # awh1-dim1-end (nm)
    n_points: int = 32             # grid points over [start, end]
    force_constant: float = 4000.0  # awh1-dim1-force-constant kJ/mol/nm^2


@dataclasses.dataclass(frozen=True)
class MdParams:
    """Static run parameters — the t_inputrec analogue.  Hashable and held
    out of the pytree so that jit specializes on it."""
    dt: float = 0.002
    nsteps: int = 0
    integrator: IntegratorType = IntegratorType.MD

    # cutoff scheme
    rcoulomb: float = 1.0
    rvdw: float = 1.0
    rlist: float = 1.05
    nstlist: int = 10
    coulomb: CoulombType = CoulombType.REACTION_FIELD
    vdw_modifier: VdwModifier = VdwModifier.POTENTIAL_SHIFT
    # vdwtype: "cut-off" | "pme" (LJ-PME dispersion grids; reference:
    # ewald/pme.cpp LJ grids, solve_pme_lj_yzx)
    vdw_type: str = "cut-off"
    ewald_rtol_lj: float = 1e-3
    epsilon_r: float = 1.0
    epsilon_rf: float = 0.0            # 0 => infinity (conducting RF)
    rvdw_switch: float = 0.9

    # PME
    ewald_rtol: float = 1e-5
    fourier_spacing: float = 0.12
    pme_order: int = 4
    pme_grid: Optional[Tuple[int, int, int]] = None
    # Ewald boundary handling (reference: inputrec ewald_geometry /
    # epsilon_surface; ewald/long_range_correction.cpp)
    ewald_geometry: str = "3d"        # 3d | 3dc (Yeh-Berkowitz slab)
    epsilon_surface: float = 0.0      # 0 = tinfoil (no dipole term)

    # dispersion correction
    dispcorr: bool = False

    # temperature coupling
    tcoupl: TcouplType = TcouplType.NO
    ref_t: float = 300.0
    tau_t: float = 1.0
    nsttcouple: int = 10
    nhchainlength: int = 10   # Nose-Hoover chain links (md-vv only)
    # simulated annealing: ("single"|"periodic", times_ps, temps_K)
    # piecewise-linear ref_t(t) (reference: inputrec SimulatedAnnealing,
    # mdlib/update.cpp update_annealing_target_temp)
    annealing: Optional[Tuple[str, Tuple[float, ...],
                              Tuple[float, ...]]] = None

    # pressure coupling
    pcoupl: PcouplType = PcouplType.NO
    # isotropic | semiisotropic (xy coupled jointly, z independently;
    # reference: epct enum, coupling.cpp berendsen_pcoupl)
    pcoupltype: str = "isotropic"
    ref_p: float = 1.0
    ref_p_z: Optional[float] = None          # semiisotropic z target
    tau_p: float = 5.0
    compressibility: float = 4.5e-5
    compressibility_z: Optional[float] = None
    nstpcouple: int = 10

    # sd (Langevin) friction is per-atom gamma = m/tau_t
    ld_seed: int = 1993

    # constraints
    lincs_order: int = 4
    lincs_iter: int = 2
    # shell-relaxation SCF iterations per step (mdp `niter`; only used
    # when the topology has [ polarization ] shells, md/shellfc.py)
    niter: int = 20

    # energy minimization (reference: inputrec em_tol/em_stepsize)
    emtol: float = 10.0       # kJ/mol/nm max-force convergence
    emstep: float = 0.01      # initial step, nm
    nbfgscorr: int = 10       # L-BFGS history size

    # test-particle insertion (reference: inputrec rtpi / nsteps per frame)
    tpi_ninsert: int = 1000

    # COM motion removal
    nstcomm: int = 100

    # output
    nstxout: int = 0          # TRR coordinate frames every N steps (0 = off)
    nstxout_compressed: int = 0   # XTC frames every N steps (0 = off)
    compressed_x_precision: float = 1000.0   # XTC precision (1/nm)
    # energies/dvdl computed every N steps (1 = every step; the reference
    # defaults to 100 and runs force-only kernels in between,
    # nbnxm_cuda.cu F vs VF kernel tables).  Non-energy frames log NaN.
    nstcalcenergy: int = 1
    # md.log energy-block interval (reference: inputrec nstlog)
    nstlog: int = 1000

    # multiple time stepping (reference: mdtypes/multipletimestepping.h,
    # mdp keys mts / mts-level2-forces / mts-level2-factor): the PME
    # reciprocal force is evaluated every mts_factor steps and applied as
    # an impulse (force scaled by the factor on those steps); energies,
    # dvdl and the virial stay unscaled instantaneous values.  Only
    # "longrange-nonbonded" level-2 forces are supported.
    mts: bool = False
    mts_factor: int = 2
    mts_forces: str = "longrange-nonbonded"

    fep: FepParams = FepParams()
    expanded: Optional[ExpandedParams] = None
    # AWH biasing on the FEP lambda coordinate
    # (reference: applied_forces/awh/awh.h:256 fepLambdaState)
    awh: Optional[AwhParams] = None
    # flat LJ walls at z=0 / z=box_zz (md/walls.py WallParams;
    # reference: mdlib/wall.cpp, mdp nwall/wall-type/wall-atomtype)
    walls: Optional[Any] = None
    # energy groups: ((name, (atom indices...)), ...) — per-group-pair
    # short-range energy decomposition, honored by mdrun -rerun
    # (reference: mdp energygrps; nbnxm Egrp kernel flavor)
    energygrps: Optional[Tuple] = None

    # COM pulling (reference: pulling/pull.cpp, hooked via
    # computeSpecialForces sim_util.cpp:624): tuple of md.pull.PullCoord
    pull: Optional[tuple] = None
    nstpullout: int = 50      # pullx/pullf output interval

    # distance restraints (reference: listed_forces/disre.cpp; mdp
    # disre-fc).  Conservative weighting = exact gradient of the
    # r^-3-averaged potential, which is what AD yields.
    disre_fc: float = 1000.0

    # applied electric field: (EfieldDim x, y, z) or None
    # (reference: applied_forces/electricfield.cpp)
    efield: Optional[tuple] = None

    # orientation restraints force constant (mdp orire-fc; reference:
    # listed_forces/orires.cpp, inputrec orires_fc)
    orires_fc: float = 0.0

    # density-guided simulation (md.densfit.DensfitParams or None;
    # reference: applied_forces/densityfitting/)
    densfit: Optional[Any] = None

    def replace(self, **kw) -> "MdParams":
        return dataclasses.replace(self, **kw)


# ---------------------------------------------------------------------------
# State
# ---------------------------------------------------------------------------

@struct.dataclass
class CouplingState:
    """Thermostat/barostat auxiliary variables (reference: t_state entries).

    ekinh_prev carries KE(v(t-3dt/2)) so the leapfrog thermostat can use
    the half-step-average temperature exactly as compute_globals does
    (reference: mdlib/tgroup.cpp ekinh/ekinh_old; md_support.cpp:110);
    -1 means "not yet initialized" (first step uses the current KE twice).
    """
    xi: Array            # Nose-Hoover xi (scalar for single group)
    vxi: Array           # Nose-Hoover velocity
    boxv: Array          # (3,3) Parrinello-Rahman box velocity
    therm_integral: Array  # v-rescale accumulated energy
    ekinh_prev: Array    # previous half-step kinetic energy


@struct.dataclass
class State:
    """Dynamic simulation state — the t_state analogue
    (reference: mdtypes/state.h:255-256 for lambda/fep_state)."""
    x: Array             # (N, 3) positions, nm
    v: Array             # (N, 3) velocities, nm/ps
    box: Array           # (3, 3)
    lam: Array           # (7,) current lambda per FepCoupling component
    fep_state: Array     # () int32 current lambda window index
    step: Array          # () int64
    rng: Array           # jax PRNG key
    coupling: CouplingState
    # expanded-ensemble weight history (md/expanded.py DfHist); None when
    # expanded ensemble is off (reference: t_state::dfhist)
    dfhist: Optional[Any] = None
    # density-fitting adaptive-scaling state (md/densfit.py DensfitState;
    # reference: DensityFittingForceProviderState)
    densfit: Optional[Any] = None
    # AWH umbrella grid-point index for the pull-coordinate provider
    # (reference: awh/coordstate.h umbrellaGridpoint); None unless
    # awh coord-provider = pull
    awh_center: Optional[Any] = None

    @property
    def n_atoms(self) -> int:
        return self.x.shape[0]


def initial_coupling_state(nhchainlength: int = 1) -> CouplingState:
    """xi/vxi carry the Nose-Hoover chain; length 1 covers leapfrog NH
    and every other thermostat (reference: state.h nosehoover_xi with
    inputrec opts.nhchainlength)."""
    return CouplingState(
        xi=jnp.zeros((nhchainlength,)),
        vxi=jnp.zeros((nhchainlength,)),
        boxv=jnp.zeros((3, 3)),
        therm_integral=jnp.zeros(()),
        ekinh_prev=jnp.asarray(-1.0),
    )


def make_state(x, v, box, lam=None, fep_state=0, seed=0) -> State:
    n = x.shape[0]
    if lam is None:
        lam = jnp.zeros((int(FepCoupling.COUNT),), jnp.float32)
    return State(
        x=jnp.asarray(x, jnp.float32),
        v=jnp.asarray(v, jnp.float32) if v is not None else jnp.zeros((n, 3), jnp.float32),
        box=jnp.asarray(box, jnp.float32),
        lam=jnp.asarray(lam, jnp.float32),
        fep_state=jnp.asarray(fep_state, jnp.int32),
        step=jnp.asarray(0, jnp.int32),
        rng=jax.random.PRNGKey(seed),
        coupling=initial_coupling_state(),
    )


# ---------------------------------------------------------------------------
# Energy bookkeeping — gmx_enerdata_t analogue
# ---------------------------------------------------------------------------

@struct.dataclass
class EnergyTerms:
    """Potential-energy decomposition + dV/dlambda channels
    (reference: mdtypes/enerdata.h; F_* enum ifunc.h)."""
    lj: Array
    coulomb: Array
    lj_recip: Array
    coul_recip: Array
    bonds: Array
    angles: Array
    dihedrals: Array
    impropers: Array
    lj14: Array
    coul14: Array
    restraints: Array
    dispcorr: Array
    # dV/dlambda per FepCoupling channel (7,)
    dvdl: Array
    # (3,) diagonal potential virial Xi_aa accumulated in the force pass
    # (zeros unless the force fn ran with need_virial; reference:
    # sim_util.cpp shift-force virial / calc_virial)
    vir_diag: Array = None

    @property
    def epot(self) -> Array:
        return (self.lj + self.coulomb + self.lj_recip + self.coul_recip
                + self.bonds + self.angles + self.dihedrals + self.impropers
                + self.lj14 + self.coul14 + self.restraints + self.dispcorr)

    @staticmethod
    def zeros(dtype=jnp.float32) -> "EnergyTerms":
        z = jnp.zeros((), dtype)
        return EnergyTerms(lj=z, coulomb=z, lj_recip=z, coul_recip=z, bonds=z,
                           angles=z, dihedrals=z, impropers=z, lj14=z,
                           coul14=z, restraints=z, dispcorr=z,
                           dvdl=jnp.zeros((int(FepCoupling.COUNT),), dtype),
                           vir_diag=jnp.zeros((3,), dtype))

    def __add__(self, other: "EnergyTerms") -> "EnergyTerms":
        return jax.tree_util.tree_map(lambda a, b: a + b, self, other)
