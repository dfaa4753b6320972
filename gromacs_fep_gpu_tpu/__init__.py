"""gromacs_fep_gpu_tpu — a TPU-native molecular dynamics engine with
GPU-FEP-class free-energy support, built from scratch in JAX/XLA/Pallas.

Capability target: the GROMACS-FEP-GPU reference (GROMACS 2023.3 fork with
CUDA-offloaded FEP); see SURVEY.md at the repo root for the blueprint.
"""
__version__ = "0.1.0"
