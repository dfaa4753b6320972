#!/usr/bin/env bash
# Umbrella sampling of a water-dimer O-O distance + WHAM PMF.
set -euo pipefail
WORK=${1:-/tmp/tpumd_wham_demo}
TPUMD="python -m gromacs_fep_gpu_tpu"
NSTEPS=${NSTEPS:-400}
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

# umbrella windows along the O-O distance of the first two waters
CENTERS="0.30 0.35 0.40 0.45 0.50 0.55"
i=0
FILES=""
for R in $CENTERS; do
  cat > w$i.mdp <<EOF
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
pull-coord1-init = $R
pull-nstxout = 5
EOF
  $TPUMD grompp -f w$i.mdp -p topol.top -c conf.gro -o w$i.tpz
  $TPUMD mdrun -s w$i.tpz -deffnm w$i
  FILES="$FILES w$i.pullx.xvg"
  i=$((i + 1))
done

KS=$(for _ in $CENTERS; do printf "2000 "; done)
$TPUMD wham -ix $FILES -x0 $CENTERS -k $KS -o pmf.xvg -temp 300
head -20 pmf.xvg
echo "done -> $WORK/pmf.xvg"
