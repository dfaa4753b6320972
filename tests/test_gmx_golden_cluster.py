"""GROMACS-golden FEP parity through the PRODUCTION force path.

Same refdata comparison as test_gmx_golden.py, but driving
make_cluster_force_fn — the cluster pair-list kernel + flat FEP pair list
+ hand-written PME pipeline that bench.py times — instead of the dense
oracle.  This mirrors the reference's acceptance criterion that the GPU
production path must reproduce the recorded refdata
(src/programs/mdrun/tests/freeenergy.cpp:159-165: the FEP matrix runs
with `-fep gpu` when CUDA is built).

The golden boxes are triclinic, so the XLA cluster kernel is exercised
(the Pallas kernels are rectangular-only by design and are validated
against the XLA kernel in test_pallas_nb.py; XLA-kernel == refdata here
closes the chain production == oracle == GROMACS).
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

SYSTEMS = [
    "coulandvdwtogether",
    "vdwalone",
    "relative",
    "transformAtoB",
]

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
ref = load_refdata(name, "d")
got = run_case(load_case(name), force_path="cluster")
out = {}
for term, vals in ref.items():
    g = got[term][: len(vals)]
    out[term] = {"ref": list(map(float, vals)), "got": list(map(float, g))}
print("GOLDEN_JSON " + json.dumps(out))
"""


def _run_driver(name):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_ENABLE_X64"] = "1"
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "-c", _DRIVER, name],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=1200)
    assert proc.returncode == 0, proc.stderr[-4000:]
    for line in proc.stdout.splitlines():
        if line.startswith("GOLDEN_JSON "):
            return json.loads(line[len("GOLDEN_JSON "):])
    raise AssertionError("driver produced no result:\n" + proc.stdout[-2000:])


@pytest.mark.parametrize("name", SYSTEMS)
def test_golden_fep_system_cluster_path(name):
    if not os.path.isdir("/root/reference/src/testutils/simulationdatabase"):
        pytest.skip("reference tree not available")
    result = _run_driver(name)
    assert "Potential" in result
    for term, data in result.items():
        ref = np.array(data["ref"])
        got = np.array(data["got"])
        if term == "Potential":
            tol = 5e-5 * np.abs(ref)
        else:
            tol = np.maximum(1e-3 * np.abs(ref), 0.015)
        err = np.abs(got - ref)
        worst = int(np.argmax(err - tol))
        assert (err <= tol).all(), (
            f"{name}/{term}: frame {worst}: ref={ref[worst]} "
            f"got={got[worst]} err={err[worst]:.3e} tol={tol[worst]:.3e}")
