#!/usr/bin/env bash
# System construction pipeline: box -> solvate -> ions -> index groups
# -> minimize -> short NVT equilibration.
set -euo pipefail
WORK=${1:-/tmp/tpumd_build_demo}
TPUMD="python -m gromacs_fep_gpu_tpu"
mkdir -p "$WORK" && cd "$WORK"

# a charged "solute" (one chloride-like particle), centered in a box
cat > solute.gro <<'EOF'
solute
    1
    1ION     CL    1   0.000   0.000   0.000
   0.10000   0.10000   0.10000
EOF
$TPUMD editconf -f solute.gro -o centered.gro -box 1.55 -c
$TPUMD solvate -cp centered.gro -box 1.55 -o solvated.gro | tee sv.log
NSOL=$(grep -oE "added [0-9]+" sv.log | grep -oE "[0-9]+")

cat > topol.top <<EOF
[ defaults ]
1 2 yes 0.5 0.8333

[ atomtypes ]
CL   35.45  -1.0   A 0.44  0.45
NA   22.99   1.0   A 0.33  0.012
OW   15.9994 -0.834 A 0.315061 0.636386
HW    1.008   0.417 A 0.0      0.0

[ moleculetype ]
ION 1

[ atoms ]
1 CL 1 ION CL 1 -1.0 35.45

[ moleculetype ]
NA+ 1

[ atoms ]
1 NA 1 NA NA 1 1.0 22.99

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
ion in water

[ molecules ]
ION 1
SOL $NSOL
EOF

cat > em.mdp <<'EOF'
integrator = steep
nsteps = 100
emtol = 100
coulombtype = reaction-field
rcoulomb = 0.7
rvdw = 0.7
rlist = 0.75
EOF
$TPUMD grompp -f em.mdp -p topol.top -c solvated.gro -o em0.tpz
# neutralize: replace one water by a sodium
$TPUMD genion -s em0.tpz -o ions.gro -neutral -pname NA -nname CL
NNA=1
NSOL2=$((NSOL - NNA))
sed -i "s/^SOL $NSOL\$/SOL $NSOL2\nNA+ $NNA/" topol.top
# genion appends ions at the end; keep topology order consistent
python - <<EOF
from gromacs_fep_gpu_tpu.io.groio import read_gro, write_gro
import numpy as np
n, r, x, v, box = read_gro("ions.gro")
order = ([i for i in range(len(n)) if r[i] == "ION"]
         + [i for i in range(len(n)) if r[i] == "SOL"]
         + [i for i in range(len(n)) if r[i] == "NA"])
write_gro("ions.gro", "ordered", [n[i] for i in order],
          [r[i] for i in order], np.asarray(x)[order], None, box)
EOF

$TPUMD make-ndx -f ions.gro -o index.ndx
$TPUMD grompp -f em.mdp -p topol.top -c ions.gro -o em.tpz
$TPUMD mdrun -s em.tpz -deffnm em

cat > nvt.mdp <<'EOF'
integrator = md
dt = 0.002
nsteps = 200
nstlist = 10
coulombtype = reaction-field
rcoulomb = 0.7
rvdw = 0.7
rlist = 0.75
tcoupl = v-rescale
ref-t = 300
tau-t = 0.5
gen-vel = yes
gen-temp = 300
EOF
$TPUMD grompp -f nvt.mdp -p topol.top -c em.gro -o nvt.tpz
$TPUMD mdrun -s nvt.tpz -deffnm nvt
$TPUMD energy -f nvt.ener.csv
echo "done -> $WORK"
