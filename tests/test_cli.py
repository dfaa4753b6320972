"""End-to-end CLI test: grompp -> mdrun -> bar on real files (the
reference's programs/mdrun/tests moduletest pattern)."""
import os
import subprocess
import sys

import numpy as np
import pytest

from gromacs_fep_gpu_tpu.cli import main as cli_main
from gromacs_fep_gpu_tpu.io.groio import write_gro
from gromacs_fep_gpu_tpu.models.water import water_template, _random_rotations

TOP = """
[ defaults ]
1 2 yes 0.5 0.8333

[ atomtypes ]
OW   15.9994  -0.834 A 0.315061 0.636386
HW    1.008    0.417 A 0.0      0.0

[ moleculetype ]
SOL 2

[ atoms ]
1 OW 1 SOL OW 1 -0.834 15.9994
2 HW 1 SOL HW1 1 0.417 1.008
3 HW 1 SOL HW2 1 0.417 1.008

[ settles ]
1 1 0.09572 0.15139

[ exclusions ]
1 2 3
2 3

[ system ]
water box

[ molecules ]
SOL 27
"""

MDP = """
integrator = md
dt = 0.001
nsteps = 30
nstlist = 10
coulombtype = reaction-field
rcoulomb = 0.55
rvdw = 0.55
rlist = 0.6
tcoupl = v-rescale
ref-t = 300
tau-t = 0.5
nstcomm = 0
free-energy = yes
init-lambda-state = 0
fep-lambdas = 0.0 0.5 1.0
sc-alpha = 0.5
sc-coul = yes
nstdhdl = 5
"""


def make_water_gro(path, n_side=3, spacing=0.4, seed=0):
    rng = np.random.RandomState(seed)
    grid = np.mgrid[0:n_side, 0:n_side, 0:n_side].reshape(3, -1).T
    centers = (grid + 0.5) * spacing
    rots = _random_rotations(len(centers), rng)
    tpl = water_template()
    x = (centers[:, None, :] + np.einsum('nij,kj->nki', rots, tpl)
         ).reshape(-1, 3)
    n = x.shape[0]
    names = ["OW", "HW1", "HW2"] * (n // 3)
    resnames = ["SOL"] * n
    box = np.diag([n_side * spacing] * 3)
    write_gro(path, "water", names, resnames, x, None, box)


def test_cli_grompp_mdrun_bar(tmp_path):
    os.chdir(tmp_path)
    make_water_gro("conf.gro")
    with open("topol.top", "w") as f:
        f.write(TOP)
    with open("md.mdp", "w") as f:
        f.write(MDP)

    cli_main(["grompp", "-f", "md.mdp", "-p", "topol.top", "-c", "conf.gro",
              "-o", "topol.tpz"])
    assert os.path.exists("topol.tpz")

    cli_main(["check", "-s", "topol.tpz"])
    cli_main(["mdrun", "-s", "topol.tpz", "-deffnm", "md", "-fep", "cpu"])
    assert os.path.exists("md.gro")
    assert os.path.exists("md.cpt")
    assert os.path.exists("md.ener.csv")
    assert os.path.exists("md.dhdl.xvg")

    # md.log: setup report, nstlog energy blocks, averages, performance
    # (reference: energyoutput.cpp:1288 pr_ebin blocks)
    assert os.path.exists("md.log")
    mdlog = open("md.log").read()
    assert "Input Parameters:" in mdlog
    assert "Energies (kJ/mol)" in mdlog
    assert "A V E R A G E S" in mdlog
    assert "Performance:" in mdlog
    assert "LJ (SR)" in mdlog and "Potential" in mdlog

    data = np.genfromtxt("md.ener.csv")
    assert data.shape[0] == 30
    assert np.isfinite(data).all()

    # binary edr twin: energies must match the csv, dH blocks present at
    # nstdhdl frames (reference: enxio.cpp + mdebin_bar.cpp layout)
    from gromacs_fep_gpu_tpu.io.edrio import ENX_DH, ENX_DHCOLL, read_edr
    assert os.path.exists("md.edr")
    names, units, frames = read_edr("md.edr")
    assert names[0] == "Potential" and len(frames) == 30
    np.testing.assert_allclose([f.ener[0] for f in frames], data[:, 1],
                               rtol=1e-5)
    dh_frames = [f for f in frames if f.blocks]
    assert len(dh_frames) == 30 // 5  # nstdhdl = 5
    ids = [b.id for b in dh_frames[0].blocks]
    assert ids[0] == ENX_DHCOLL and ids.count(ENX_DH) >= 3

    # restart from checkpoint continues
    cli_main(["mdrun", "-s", "topol.tpz", "-deffnm", "md2", "-cpi", "md.cpt",
              "-nsteps", "10", "-fep", "cpu"])
    assert os.path.exists("md2.gro")


def test_cli_ensemble_replex(tmp_path):
    """tpumd ensemble: all windows in lockstep + replica exchange + BAR
    (mdrun -multidir -replex analogue)."""
    os.chdir(tmp_path)
    make_water_gro("conf.gro")
    with open("topol.top", "w") as f:
        f.write(TOP)
    with open("md.mdp", "w") as f:
        f.write(MDP.replace("nsteps = 30", "nsteps = 40"))

    cli_main(["grompp", "-f", "md.mdp", "-p", "topol.top", "-c", "conf.gro",
              "-o", "topol.tpz"])
    cli_main(["ensemble", "-s", "topol.tpz", "-deffnm", "ens",
              "-replex", "20", "-fep", "cpu"])
    for i in range(3):   # fep-lambdas has 3 windows
        assert os.path.exists(f"ens.w{i}.dhdl.xvg")
        assert os.path.exists(f"ens.w{i}.cpt")
    # pure water: Delta-H between windows is identically 0 -> files parse
    from gromacs_fep_gpu_tpu.io.xvgio import read_xvg
    data, legends = read_xvg("ens.w1.dhdl.xvg")
    assert data.shape[0] > 0
    assert np.isfinite(data).all()


def test_cli_pull_outputs(tmp_path):
    """pull-* mdp keys produce pullx/pullf.xvg through the CLI
    (reference: pulling/output.cpp; mdp keys readir.cpp pull section)."""
    os.chdir(tmp_path)
    make_water_gro("conf.gro")
    with open("topol.top", "w") as f:
        f.write(TOP)
    mdp = MDP.replace("free-energy = yes", "free-energy = no") + """
pull = yes
pull-ngroups = 2
pull-ncoords = 1
pull-group1-atoms = 1 2 3
pull-group2-atoms = 40 41 42
pull-coord1-groups = 1 2
pull-coord1-type = umbrella
pull-coord1-init = 0.5
pull-coord1-k = 500
pull-nstxout = 5
"""
    with open("md.mdp", "w") as f:
        f.write(mdp)
    cli_main(["grompp", "-f", "md.mdp", "-p", "topol.top", "-c", "conf.gro",
              "-o", "topol.tpz"])
    cli_main(["mdrun", "-s", "topol.tpz", "-deffnm", "md", "-fep", "cpu"])
    assert os.path.exists("md.pullx.xvg")
    assert os.path.exists("md.pullf.xvg")
    x = np.genfromtxt("md.pullx.xvg", comments="@")
    f_ = np.genfromtxt("md.pullf.xvg", comments="@")
    assert x.shape == f_.shape and x.shape[1] == 2
    assert np.isfinite(x).all() and np.isfinite(f_).all()


def test_cli_rerun(tmp_path):
    """mdrun -rerun recomputes energies/dhdl over a written trajectory
    and matches the in-run dhdl log (reference: mdrun/rerun.cpp:168)."""
    os.chdir(tmp_path)
    make_water_gro("conf.gro")
    with open("topol.top", "w") as f:
        f.write(TOP)
    with open("md.mdp", "w") as f:
        f.write(MDP + "nstxout = 10\n")
    cli_main(["grompp", "-f", "md.mdp", "-p", "topol.top", "-c", "conf.gro",
              "-o", "topol.tpz"])
    cli_main(["mdrun", "-s", "topol.tpz", "-deffnm", "md", "-fep", "cpu"])
    assert os.path.exists("md.trr")
    cli_main(["mdrun", "-s", "topol.tpz", "-deffnm", "rr", "-fep", "cpu",
              "-rerun", "md.trr"])
    assert os.path.exists("rr.ener.csv")
    assert os.path.exists("rr.dhdl.xvg")
    e = np.genfromtxt("rr.ener.csv")
    assert np.isfinite(e).all() and e.shape[0] >= 2
    # the rerun potential at the final frame must match the in-run value
    run_e = np.genfromtxt("md.ener.csv")
    t_last = e[-1, 0]
    row = run_e[np.argmin(np.abs(run_e[:, 0] - t_last))]
    assert abs(row[1] - e[-1, 1]) < 2e-3 * abs(row[1]) + 0.5


def test_cli_maxh_stops_early(tmp_path):
    """-maxh must end the run at a verified chunk boundary with outputs
    and checkpoint written (reference: mdrun -maxh + StopHandler)."""
    os.chdir(tmp_path)
    make_water_gro("conf.gro")
    with open("topol.top", "w") as f:
        f.write(TOP)
    with open("md.mdp", "w") as f:
        f.write(MDP.replace("nsteps = 30", "nsteps = 100000"))
    cli_main(["grompp", "-f", "md.mdp", "-p", "topol.top", "-c", "conf.gro",
              "-o", "topol.tpz"])
    # ~tenth of a second of walltime: stops after the first checked chunk
    cli_main(["mdrun", "-s", "topol.tpz", "-deffnm", "mh", "-fep", "cpu",
              "-maxh", str(0.1 / 3600.0 / 0.99)])
    assert os.path.exists("mh.cpt") and os.path.exists("mh.ener.csv")
    data = np.genfromtxt("mh.ener.csv")
    assert 0 < data.shape[0] < 100000


def test_cli_xtc_output_and_rerun(tmp_path):
    """nstxout-compressed writes an .xtc (native codec, GROMACS bitstream)
    that rerun can consume (reference: xtcio.cpp + rerun.cpp)."""
    os.chdir(tmp_path)
    make_water_gro("conf.gro")
    with open("topol.top", "w") as f:
        f.write(TOP)
    with open("md.mdp", "w") as f:
        f.write(MDP + "nstxout-compressed = 10\ncompressed-x-precision = 1000\n")
    cli_main(["grompp", "-f", "md.mdp", "-p", "topol.top", "-c", "conf.gro",
              "-o", "topol.tpz"])
    cli_main(["mdrun", "-s", "topol.tpz", "-deffnm", "xc", "-fep", "cpu"])
    from gromacs_fep_gpu_tpu.io.xtcio import read_xtc_frame, scan_xtc
    na, nf = scan_xtc("xc.xtc")
    assert na == 81 and nf >= 2
    fr = read_xtc_frame("xc.xtc", nf - 1, na)
    assert np.isfinite(fr["x"]).all() and fr["precision"] == 1000.0
    # rerun over the compressed trajectory reproduces dhdl output
    cli_main(["mdrun", "-s", "topol.tpz", "-deffnm", "rr", "-fep", "cpu",
              "-rerun", "xc.xtc"])
    assert os.path.exists("rr.dhdl.xvg")


def test_cli_expanded_restart_preserves_weights(tmp_path):
    """Restarting an expanded-ensemble run from a checkpoint must carry
    the Wang-Landau weight history (reference: exactcontinuation —
    dfhist is part of t_state)."""
    os.chdir(tmp_path)
    make_water_gro("conf.gro")
    with open("topol.top", "w") as f:
        f.write(TOP)
    mdp = MDP.replace("free-energy = yes", "free-energy = expanded") + """
nstexpanded = 5
lmc-stats = wang-landau
lmc-move = metropolized-gibbs
lmc-seed = 7
init-wl-delta = 1.0
"""
    with open("md.mdp", "w") as f:
        f.write(mdp)
    cli_main(["grompp", "-f", "md.mdp", "-p", "topol.top", "-c", "conf.gro",
              "-o", "topol.tpz"])
    cli_main(["mdrun", "-s", "topol.tpz", "-deffnm", "e1", "-fep", "cpu"])
    import numpy as np
    cpt = np.load("e1.cpt")
    # full State incl. the DfHist leaves (5 extra beyond the base 9)
    n_leaves = len([k for k in cpt.files if k.startswith("leaf_")])
    assert n_leaves >= 14
    # restart: weights must not reset (run continues with history)
    cli_main(["mdrun", "-s", "topol.tpz", "-deffnm", "e2", "-fep", "cpu",
              "-cpi", "e1.cpt"])
    cpt2 = np.load("e2.cpt")
    assert len([k for k in cpt2.files if k.startswith("leaf_")]) == n_leaves
    # visit counts accumulated across both runs (30 + 30 steps, MC
    # every 5 steps -> n_at_lam total > one run's)
    def total_visits(c):
        # n_at_lam is the DfHist leaf with shape (3,) summing visits
        return max(float(c[k].sum()) for k in c.files
                   if k.startswith("leaf_") and c[k].shape == (3,))
    assert total_visits(cpt2) > total_visits(cpt)


def test_cli_bar_from_edr(tmp_path):
    """gmx-bar-style estimation directly from binary .edr dH blocks
    (reference: gmx bar edr input; mdlib/mdebin_bar.cpp layout)."""
    os.chdir(tmp_path)
    make_water_gro("conf.gro")
    with open("topol.top", "w") as f:
        f.write(TOP)
    for i in range(2):
        with open("md.mdp", "w") as f:
            f.write(MDP.replace("init-lambda-state = 0",
                                f"init-lambda-state = {i}"))
        cli_main(["grompp", "-f", "md.mdp", "-p", "topol.top", "-c",
                  "conf.gro", "-o", f"w{i}.tpz"])
        cli_main(["mdrun", "-s", f"w{i}.tpz", "-deffnm", f"w{i}",
                  "-fep", "cpu"])
        assert os.path.exists(f"w{i}.edr")
    # pure water: all windows identical -> dG = 0 exactly
    import contextlib, io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cli_main(["bar", "-f", "w0.edr", "w1.edr"])
    out = buf.getvalue()
    assert "total" in out
    total = float(out.split("total")[1].split()[0])
    assert abs(total) < 1e-6
