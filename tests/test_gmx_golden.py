"""GROMACS-golden FEP parity: run the reference's FEP acceptance systems
(src/testutils/simulationdatabase/freeenergy/*) for their full 20 steps and
compare the per-frame Potential and dV/dl terms against the recorded
double-precision refdata shipped with the reference
(src/programs/mdrun/tests/refdata/*FreeEnergyReferenceTest*_d.xml;
runner semantics: src/programs/mdrun/tests/freeenergy.cpp:91-165).

The comparison runs our full MD chain — grompp-lite, dense force oracle,
PME, LINCS/SETTLE, leapfrog or velocity-verlet, Berendsen coupling, COM
removal — in float64 on the CPU backend (a subprocess: x64 is a global
flag and the rest of the suite runs fp32).

Tolerances: Potential rel 5e-5; dV/dl terms max(1e-3 rel, 0.015 abs) —
trajectory (Lyapunov) divergence from sub-ulp force differences dominates
by frame 20; frame-0 values match to ~1e-6 rel.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

SYSTEMS = [
    "coulandvdwtogether",
    "coulandvdwsequential_coul",
    "coulandvdwsequential_vdw",
    "vdwalone",
    "relative",
    "relative-position-restraints",
    "restraints",
    "transformAtoB",
    "simtemp",
    "expanded",
]

# Per-frame energy comparison is limited for the 100-step expanded run:
# trajectory chaos decorrelates any two correct implementations within
# ~60 steps (the reference's own test uses a looser tolerance there,
# freeenergy.cpp:117 longEnergyTolerance).  The strong assertion is the
# discrete Wang-Landau/metropolized-Gibbs lambda-state trajectory, which
# must match the reference's MC decisions exactly (same ThreeFry stream).
MAX_FRAMES = {}

# Post-step lambda states every 5 steps of the `expanded` system, recorded
# from the reference double build (gmx_d mdrun on the shipped tpr inputs;
# sim.log MC-lambda tables, converted to post-step 0-indexed states).
EXPANDED_STATES_EVERY5 = [4, 8, 8, 8, 7, 7, 7, 8, 8, 6, 7, 6, 6, 8, 8, 7,
                          7, 7, 3, 5, 5]

_DRIVER = r"""
import json, sys, warnings
warnings.simplefilter("ignore")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
from gromacs_fep_gpu_tpu.validate.golden import load_case, load_refdata
from gromacs_fep_gpu_tpu.validate.runner import run_case

name = sys.argv[1]
mode = sys.argv[2] if len(sys.argv) > 2 else "traj"
ref = load_refdata(name, "d")
out = {}
if mode == "step0":
    from gromacs_fep_gpu_tpu.validate.runner import run_case_step0
    got0 = run_case_step0(load_case(name))
    for term, vals in ref.items():
        if term in got0:
            out[term] = {"ref": [float(vals[0])], "got": [float(got0[term])]}
else:
    got = run_case(load_case(name))
    for term, vals in ref.items():
        g = got[term][: len(vals)]
        out[term] = {"ref": list(map(float, vals)),
                     "got": list(map(float, g))}
    out["fep_state"] = list(map(int, got["fep_state"]))
print("GOLDEN_JSON " + json.dumps(out))
"""


def _run_driver(name, mode="traj"):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_ENABLE_X64"] = "1"
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "-c", _DRIVER, name, mode],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=1200)
    assert proc.returncode == 0, proc.stderr[-4000:]
    for line in proc.stdout.splitlines():
        if line.startswith("GOLDEN_JSON "):
            return json.loads(line[len("GOLDEN_JSON "):])
    raise AssertionError("driver produced no result:\n" + proc.stdout[-2000:])


@pytest.mark.parametrize("name", SYSTEMS)
def test_golden_fep_system(name):
    if not os.path.isdir("/root/reference/src/testutils/simulationdatabase"):
        pytest.skip("reference tree not available")
    result = _run_driver(name)
    assert "Potential" in result
    nmax = MAX_FRAMES.get(name)
    for term, data in result.items():
        if term == "fep_state":
            continue
        ref = np.array(data["ref"])[:nmax]
        got = np.array(data["got"])[:nmax]
        if name == "expanded":
            # 101-frame run: slightly looser for Lyapunov growth (the
            # reference's own expanded gate is looser too,
            # freeenergy.cpp:117 longEnergyTolerance)
            tol = (5e-5 * np.abs(ref) if term == "Potential"
                   else np.maximum(2e-3 * np.abs(ref), 0.05))
        elif term == "Potential":
            tol = 5e-5 * np.abs(ref)
        else:
            tol = np.maximum(1e-3 * np.abs(ref), 0.015)
        # frame 0 is a NON-accumulating comparison at the reference's
        # own initial configuration: hold it to the reference's dhdl
        # tolerance (freeenergy.cpp:115-136) — no trajectory-chaos
        # allowance applies before the first step.  The absolute floor
        # covers constraint-PROJECTION degeneracy: our matrix-free LINCS
        # lands on a slightly different (equally valid) point of the
        # constraint manifold than the reference's, which
        # position-dependent restraint terms feel at the ~5e-4 level
        # while all other frame-0 terms match to ~1e-6.
        tol[0] = max(1e-4 * abs(ref[0]), 1e-3)
        err = np.abs(got - ref)
        worst = int(np.argmax(err - tol))
        assert (err <= tol).all(), (
            f"{name}/{term}: frame {worst}: ref={ref[worst]} got={got[worst]} "
            f"err={err[worst]:.3e} tol={tol[worst]:.3e}")
    if name == "expanded":
        states = result["fep_state"][0::5]
        assert states == EXPANDED_STATES_EVERY5, (
            f"lambda-state MC trajectory diverged from the reference: "
            f"{states} != {EXPANDED_STATES_EVERY5}")

