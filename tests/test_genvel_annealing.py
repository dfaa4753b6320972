"""gen-vel (grompp Maxwell-Boltzmann start velocities) and simulated
annealing (piecewise-linear ref_t(t)) tests.

Reference: gmxpreprocess/grompp.cpp maxwell_speed/low_mspeed + stopcm_gr;
mdlib/update.cpp update_annealing_target_temp, readir.cpp annealing keys.
"""
import numpy as np

from gromacs_fep_gpu_tpu.core.units import BOLTZ
from gromacs_fep_gpu_tpu.core.types import TcouplType
from gromacs_fep_gpu_tpu.io.mdpio import mdp_to_params

MDP_BASE = """
integrator = md
dt = 0.002
nsteps = 10
coulombtype = reaction-field
rcoulomb = 0.55
rvdw = 0.55
rlist = 0.6
nstcomm = 0
"""

TOP = """
[ defaults ]
1 2 yes 0.5 0.8333

[ atomtypes ]
AR 39.948 0.0 A 0.34 0.98

[ moleculetype ]
AR 1

[ atoms ]
1 AR 1 AR AR 1 0.0 39.948

[ system ]
argon

[ molecules ]
AR 64
"""


def test_gen_vel_maxwell_boltzmann():
    from gromacs_fep_gpu_tpu.io.grompp import preprocess_arrays

    rng = np.random.default_rng(2)
    grid = np.mgrid[0:4, 0:4, 0:4].reshape(3, -1).T
    x = ((grid + 0.5) * 0.5).astype(np.float32)
    box = np.eye(3, dtype=np.float32) * 2.0
    names = ["AR"] * 64
    res = ["AR"] * 64
    pp = preprocess_arrays(MDP_BASE + "gen-vel = yes\ngen-temp = 250\n"
                           "gen-seed = 7\n",
                           TOP, names, res, x, None, box)
    v = np.asarray(pp.state.v, np.float64)
    m = np.asarray(pp.system.mass_a, np.float64)
    # exact target temperature by construction (low_mspeed rescales)
    ndf = 3 * 64 - 3
    t = (m[:, None] * v * v).sum() / (ndf * BOLTZ)
    np.testing.assert_allclose(t, 250.0, rtol=1e-5)
    # COM momentum removed
    p = (m[:, None] * v).sum(0)
    assert np.abs(p).max() < 1e-8 * m.sum()
    # without gen-vel: zero velocities
    pp0 = preprocess_arrays(MDP_BASE, TOP, names, res, x, None, box)
    assert np.abs(np.asarray(pp0.state.v)).max() == 0.0


def test_annealing_mdp_parse():
    params, _ = mdp_to_params(MDP_BASE + """
tcoupl = v-rescale
ref-t = 300
tau-t = 0.5
annealing = single
annealing-npoints = 3
annealing-time = 0 10 20
annealing-temp = 300 200 100
""")
    assert params.annealing == ("single", (0.0, 10.0, 20.0),
                                (300.0, 200.0, 100.0))


def test_annealing_cools_the_run():
    """v-rescale toward a ramped target: the measured temperature must
    track the annealing schedule downward."""
    from gromacs_fep_gpu_tpu.core.topology import MoleculeType, build_system
    from gromacs_fep_gpu_tpu.core.types import MdParams, make_state
    from gromacs_fep_gpu_tpu.md.runner import MdRunner, RunnerConfig
    from gromacs_fep_gpu_tpu.md.runner import concat_logs

    n_side = 4
    mol = MoleculeType(name="AR", types_a=[0], charges_a=[0.0],
                       masses_a=[39.948])
    nbfp = np.zeros((1, 1, 2), np.float32)
    nbfp[0, 0, 0] = 0.0097  # c6 ~ argon
    nbfp[0, 0, 1] = 9.6e-6
    system = build_system([(mol, n_side ** 3)], nbfp)
    grid = np.mgrid[0:n_side, 0:n_side, 0:n_side].reshape(3, -1).T
    x = ((grid + 0.5) * 0.45).astype(np.float32)
    rng = np.random.default_rng(0)
    m = 39.948
    v0 = rng.normal(0, np.sqrt(BOLTZ * 300.0 / m),
                    (n_side ** 3, 3)).astype(np.float32)
    state = make_state(x, v0, np.eye(3, dtype=np.float32) * (n_side * 0.45))
    params = MdParams(dt=0.002, rcoulomb=0.55, rvdw=0.55, rlist=0.6,
                      tcoupl=TcouplType.V_RESCALE, ref_t=300.0,
                      tau_t=0.1, nsttcouple=1, nstcomm=0,
                      annealing=("single", (0.0, 1.0), (300.0, 50.0)))
    runner = MdRunner(system, params, RunnerConfig(use_dense=True))
    final, logs = runner.run(state, 500)   # 1 ps: ramp 300 -> 50 K
    log = concat_logs(logs)
    temps = np.asarray(log.temp)
    # late-run temperature must approach the cooled target
    assert temps[-50:].mean() < 120.0
    assert temps[:50].mean() > 180.0