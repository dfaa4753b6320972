"""Test configuration: run on CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware (the TPU analogue of the
reference's thread-MPI in-process rank testing, testutils/mpitest.h).

Note: this environment pre-sets JAX_PLATFORMS=axon (remote TPU tunnel);
tests must force the local CPU platform or every op/compile RPCs through
the tunnel.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables between test modules.

    One long pytest process accumulates every jitted program of every
    module; on some hosts XLA:CPU eventually segfaults inside LLVM when
    compiling yet another large program into the same process (observed
    deterministically ~200 compilations in).  Clearing per module keeps
    the live-executable set bounded at a small recompilation cost.
    """
    yield
    jax.clear_caches()
