#!/usr/bin/env bash
# The umbrella_wham.sh PMF from ONE adaptive run: AWH biasing the pull
# coordinate (awh1-dim1-coord-provider = pull).
set -euo pipefail
WORK=${1:-/tmp/tpumd_awh_demo}
TPUMD="python -m gromacs_fep_gpu_tpu"
NSTEPS=${NSTEPS:-2000}
mkdir -p "$WORK" && cd "$WORK"

$TPUMD solvate -box 1.24 -o conf.gro
NSOL=$(python - <<'EOF'
from gromacs_fep_gpu_tpu.io.groio import read_gro
print(len(read_gro("conf.gro")[0]) // 3)
EOF
)
cat > topol.top <<EOF
[ defaults ]
1 2 yes 0.5 0.8333

[ atomtypes ]
OW   15.9994 -0.834 A 0.315061 0.636386
HW    1.008   0.417 A 0.0      0.0

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
water

[ molecules ]
SOL $NSOL
EOF

cat > md.mdp <<EOF
integrator = md
dt = 0.002
nsteps = $NSTEPS
nstlist = 10
coulombtype = reaction-field
rcoulomb = 0.55
rvdw = 0.55
rlist = 0.6
tcoupl = v-rescale
ref-t = 300
tau-t = 0.5
gen-vel = yes
pull = yes
pull-ngroups = 2
pull-ncoords = 1
pull-group1-atoms = 1
pull-group2-atoms = 4
pull-coord1-groups = 1 2
pull-coord1-type = umbrella
pull-coord1-k = 2000
pull-coord1-init = 0.35
awh = yes
awh-nstsample = 5
awh-nsamples-update = 10
awh1-dim1-coord-provider = pull
awh1-dim1-coord-index = 1
awh1-dim1-start = 0.30
awh1-dim1-end = 0.55
awh1-dim1-grid-points = 11
awh1-dim1-force-constant = 2000
awh1-error-init = 10
EOF
$TPUMD grompp -f md.mdp -p topol.top -c conf.gro -o topol.tpz
$TPUMD mdrun -s topol.tpz -deffnm awh
cat awh.awh.xvg
echo "done -> $WORK/awh.awh.xvg (PMF over the coordinate grid)"
