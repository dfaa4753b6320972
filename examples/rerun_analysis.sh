#!/usr/bin/env bash
# Post-processing workflow: run once writing a trajectory, then rerun
# with energy groups for interaction energies (LIE), plus structural
# analysis (rdf, msd, rms, hbond, sasa).
set -euo pipefail
WORK=${1:-/tmp/tpumd_rerun_demo}
TPUMD="python -m gromacs_fep_gpu_tpu"
NSTEPS=${NSTEPS:-300}
mkdir -p "$WORK" && cd "$WORK"

cat > lig.gro <<'EOF'
ligand
    1
    1LIG     C1    1   0.620   0.620   0.620
   1.24000   1.24000   1.24000
EOF
$TPUMD solvate -cp lig.gro -box 1.24 -o conf.gro | tee sv.log
NSOL=$(grep -oE "added [0-9]+" sv.log | grep -oE "[0-9]+")
cat > topol.top <<EOF
[ defaults ]
1 2 yes 0.5 0.8333

[ atomtypes ]
CL4  16.043  0.0    A 0.373  1.23
OW   15.9994 -0.834 A 0.315061 0.636386
HW    1.008   0.417 A 0.0      0.0

[ moleculetype ]
LIG 3

[ atoms ]
1 CL4 1 LIG C1 1 0.0 16.043

[ moleculetype ]
SOL 2

[ atoms ]
1 OW 1 SOL OW  1 -0.834 15.9994
2 HW 1 SOL HW1 1  0.417 1.008
3 HW 1 SOL HW2 1  0.417 1.008

[ settles ]
1 1 0.09572 0.15139

[ exclusions ]
1 2 3
2 3

[ system ]
ligand in water

[ molecules ]
LIG 1
SOL $NSOL
EOF

cat > index.ndx <<'EOF'
[ LIG ]
1
EOF

cat > md.mdp <<EOF
integrator = md
dt = 0.002
nsteps = $NSTEPS
nstlist = 10
nstxout = 10
coulombtype = reaction-field
rcoulomb = 0.55
rvdw = 0.55
rlist = 0.6
tcoupl = v-rescale
ref-t = 300
tau-t = 0.5
gen-vel = yes
energygrps = LIG Water
EOF
$TPUMD grompp -f md.mdp -p topol.top -c conf.gro -n index.ndx -o topol.tpz
$TPUMD mdrun -s topol.tpz -deffnm md

# interaction energies via rerun + the LIE binding estimate
$TPUMD mdrun -s topol.tpz -deffnm rr -rerun md.trr
$TPUMD lie -f rr.eg.xvg -ligand LIG -elj 0 -eqq 0

# structure analysis on the same trajectory
$TPUMD rdf     -f md.trr -sel-a "$(seq -s' ' 2 3 $((1 + 3 * NSOL)))" -o rdf.xvg || true
$TPUMD msd     -f md.trr -o msd.xvg
$TPUMD rms     -f md.trr -s topol.tpz -o rms.xvg
$TPUMD hbond   -f md.trr -s topol.tpz -o hb.xvg
$TPUMD sasa    -f md.trr -s topol.tpz -sel "1" -o sasa.xvg
$TPUMD gyrate  -f md.trr -s topol.tpz -o gyr.xvg
echo "done -> $WORK"
