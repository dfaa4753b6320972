#!/usr/bin/env bash
# Solvation free energy of a methane-like ligand: build the box with
# the CLI, decouple the ligand over a lambda ladder (couple-moltype),
# run every window, estimate dG with BAR and MBAR.
set -euo pipefail
WORK=${1:-/tmp/tpumd_fep_demo}
TPUMD="python -m gromacs_fep_gpu_tpu"
BOX=${BOX:-1.24}          # nm; enlarge on real hardware
NSTEPS=${NSTEPS:-200}     # per window; 50k+ for production
mkdir -p "$WORK" && cd "$WORK"

# 1. a ligand molecule + the water box around it
cat > lig.gro <<'EOF'
methane-like ligand
    1
    1LIG     C1    1   0.620   0.620   0.620
   1.24000   1.24000   1.24000
EOF
$TPUMD solvate -cp lig.gro -box "$BOX" -o conf.gro | tee solvate.log
NSOL=$(grep -oE "added [0-9]+" solvate.log | grep -oE "[0-9]+")

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

# 2. the lambda ladder (vdW decoupling via couple-moltype)
LAMBDAS="0.0 0.25 0.5 0.75 1.0"
N=0
for L in $LAMBDAS; do
  cat > md$N.mdp <<EOF
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
gen-temp = 300
free-energy = yes
init-lambda-state = $N
vdw-lambdas = 0.0 0.25 0.5 0.75 1.0
couple-moltype = LIG
couple-lambda0 = vdw
couple-lambda1 = none
couple-intramol = no
sc-alpha = 0.5
nstdhdl = 10
EOF
  $TPUMD grompp -f md$N.mdp -p topol.top -c conf.gro -o w$N.tpz
  $TPUMD mdrun -s w$N.tpz -deffnm w$N
  N=$((N + 1))
done

# 3. free energy: pairwise BAR and all-sample MBAR
$TPUMD bar -f w0.dhdl.xvg w1.dhdl.xvg w2.dhdl.xvg w3.dhdl.xvg w4.dhdl.xvg
$TPUMD bar -f w0.dhdl.xvg w1.dhdl.xvg w2.dhdl.xvg w3.dhdl.xvg w4.dhdl.xvg -method mbar
echo "done -> $WORK"
