"""Virtual-site tests: construction geometry, force spreading (Newton's
third law + zero vsite force), and TIP4P NVT stability."""
import jax
import jax.numpy as jnp
import numpy as np

from gromacs_fep_gpu_tpu.core.types import (CoulombType, MdParams,
                                            TcouplType)
from gromacs_fep_gpu_tpu.md.runner import MdRunner, RunnerConfig, concat_logs
from gromacs_fep_gpu_tpu.md.vsites import construct_vsites, spread_vsite_forces
from gromacs_fep_gpu_tpu.models.tip4p import D_OM, tip4p_box


def test_construct_places_m_site():
    system, state = tip4p_box(2, spacing=0.5)
    x = construct_vsites(state.x, system.vsites)
    at = np.asarray(system.vsites.atoms)
    xm = np.asarray(x)[at[:, 0]]
    xo = np.asarray(x)[at[:, 1]]
    xh1 = np.asarray(x)[at[:, 2]]
    xh2 = np.asarray(x)[at[:, 3]]
    d_om = np.linalg.norm(xm - xo, axis=1)
    np.testing.assert_allclose(d_om, D_OM, rtol=1e-4)
    # M on the bisector: distance to both H equal
    np.testing.assert_allclose(np.linalg.norm(xm - xh1, axis=1),
                               np.linalg.norm(xm - xh2, axis=1), rtol=1e-4)


def test_force_spreading_conserves_total():
    system, state = tip4p_box(2, spacing=0.5, seed=3)
    x = construct_vsites(state.x, system.vsites)
    rng = np.random.RandomState(0)
    f = jnp.asarray(rng.randn(*x.shape).astype(np.float32))
    fs = spread_vsite_forces(x, f, system.vsites)
    at = np.asarray(system.vsites.atoms)
    # vsite rows zeroed, total force conserved
    assert np.abs(np.asarray(fs)[at[:, 0]]).max() < 1e-6
    np.testing.assert_allclose(np.asarray(fs).sum(0), np.asarray(f).sum(0),
                               atol=1e-3)


def test_tip4p_nvt_runs_stable():
    params = MdParams(dt=0.001, nstlist=10, coulomb=CoulombType.REACTION_FIELD,
                      rcoulomb=0.55, rvdw=0.55, rlist=0.62, nstcomm=0,
                      tcoupl=TcouplType.V_RESCALE, ref_t=300.0, nsttcouple=1,
                      tau_t=0.2)
    system, state = tip4p_box(3, spacing=0.4, temperature=250.0, seed=4)
    runner = MdRunner(system, params)
    final, logs = runner.run(state, 40)
    log = concat_logs(logs)
    assert np.isfinite(np.asarray(log.epot)).all()
    # M sites still exactly on geometry after the run
    xc = np.asarray(final.x)
    at = np.asarray(system.vsites.atoms)
    d_om = np.linalg.norm(xc[at[:, 0]] - xc[at[:, 1]], axis=1)
    np.testing.assert_allclose(d_om, D_OM, rtol=1e-3)
    # no explosion (lattice start releases PE, so T runs warm but bounded)
    assert 100 < np.asarray(log.temp)[-10:].mean() < 1200


def test_vsite_3fd_3fad_4fdn_geometry():
    """New construction types (reference: vsite.cpp constr_vsite3FD:471,
    constr_vsite3FAD:523, constr_vsite4FDN:711): geometric invariants +
    force-spread consistency (vjp momentum conservation)."""
    import numpy as np
    from gromacs_fep_gpu_tpu.core.types import VirtualSites
    from gromacs_fep_gpu_tpu.md.vsites import (construct_vsites,
                                               spread_vsite_forces)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.uniform(1.0, 2.0, (5, 3)).astype(np.float32))
    # site=4 constructed from atoms 0,1,2(,3)
    d = 0.25
    theta = np.radians(65.0)
    cases = [
        (5, (0.4, d, 0.0)),                                   # 3fd: (a, d)
        (6, (d * np.cos(theta), d * np.sin(theta), 0.0)),     # 3fad
        (7, (0.3, 0.4, 0.15)),                                # 4fdn
    ]
    for kind, pars in cases:
        vs = VirtualSites(
            atoms=jnp.asarray([[4, 0, 1, 2, 3]], jnp.int32),
            params=jnp.asarray([pars], jnp.float32),
            kind=jnp.asarray([kind], jnp.int32),
            mask=jnp.ones((1,), jnp.float32))
        xc = construct_vsites(x, vs)
        xs = np.asarray(xc[4])
        xi, xj, xk, xl = (np.asarray(x[i]) for i in range(4))
        if kind == 5:       # distance d from i along i->(point on jk)
            np.testing.assert_allclose(np.linalg.norm(xs - xi), d,
                                       rtol=1e-5)
            t = (xj - xi) + pars[0] * (xk - xj)
            cosang = np.dot(xs - xi, t) / (np.linalg.norm(xs - xi)
                                           * np.linalg.norm(t))
            np.testing.assert_allclose(cosang, 1.0, rtol=1e-5)
        elif kind == 6:     # distance d from i, angle theta to rij
            np.testing.assert_allclose(np.linalg.norm(xs - xi), d,
                                       rtol=1e-5)
            rij = xj - xi
            cosang = np.dot(xs - xi, rij) / (np.linalg.norm(xs - xi)
                                             * np.linalg.norm(rij))
            np.testing.assert_allclose(cosang, np.cos(theta), rtol=1e-4)
        else:               # 4fdn: distance c from i, normal to rja/rjb
            np.testing.assert_allclose(np.linalg.norm(xs - xi), pars[2],
                                       rtol=1e-5)
            rja = pars[0] * (xk - xi) - (xj - xi)
            rjb = pars[1] * (xl - xi) - (xj - xi)
            assert abs(np.dot(xs - xi, rja)) < 1e-5
            assert abs(np.dot(xs - xi, rjb)) < 1e-5
        # spread: momentum conservation (sum f unchanged), vsite row zero
        f = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
        fs = spread_vsite_forces(x, f, vs)
        np.testing.assert_allclose(np.asarray(fs[4]), 0.0, atol=1e-7)
        np.testing.assert_allclose(np.asarray(fs.sum(0)),
                                   np.asarray(f.sum(0)), atol=1e-4)


def test_vsite_top_parsing_new_types():
    """[ virtual_sites3 ] funct 2/3 and [ virtual_sites4 ] funct 2 parse
    into the right kinds (reference: toppush.cpp vsite sections)."""
    from gromacs_fep_gpu_tpu.io.topio import parse_top
    top = """
[ defaults ]
1 2 yes 0.5 0.8333
[ atomtypes ]
X 1.0 0.0 A 0.3 0.5
[ moleculetype ]
M 2
[ atoms ]
1 X 1 M A1 1 0.0 1.0
2 X 1 M A2 1 0.0 1.0
3 X 1 M A3 1 0.0 1.0
4 X 1 M A4 1 0.0 1.0
5 X 1 M V1 1 0.0 0.0
6 X 1 M V2 1 0.0 0.0
7 X 1 M V3 1 0.0 0.0
[ virtual_sites3 ]
5 1 2 3 2 0.4 0.25
6 1 2 3 3 65.0 0.25
[ virtual_sites4 ]
7 1 2 3 4 2 0.3 0.4 0.15
[ system ]
t
[ molecules ]
M 1
"""
    parsed = parse_top(top)
    m = parsed.moltypes["M"]
    assert len(m.vsites3fd) == 1 and m.vsites3fd[0][0] == (4, 0, 1, 2)
    assert len(m.vsites3fad) == 1
    import math
    np.testing.assert_allclose(m.vsites3fad[0][1][0],
                               0.25 * math.cos(math.radians(65.0)))
    assert len(m.vsites4fdn) == 1 and m.vsites4fdn[0][0] == (6, 0, 1, 2, 3)
