"""Checkpoint/restart of the full simulation state
(reference: src/gromacs/fileio/checkpoint.cpp:2333 write_checkpoint_data /
:2635 read_checkpoint — full t_state incl. lambda, fep_state, coupling
variables and RNG; exactcontinuation.cpp enforces bitwise restart).

Format: npz of every State leaf + metadata.  Writes are atomic
(tmp + rename) so an interrupted write never corrupts the previous
checkpoint, mirroring the reference's keep-old-cpt behaviour."""
from __future__ import annotations

import os
import tempfile
from typing import Optional, Tuple

import jax
import numpy as np

from ..core.types import CouplingState, State

_FORMAT_VERSION = 1


def save_checkpoint(path: str, state: State, extra: Optional[dict] = None):
    leaves, treedef = jax.tree_util.tree_flatten(state)
    payload = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    payload["format_version"] = np.asarray(_FORMAT_VERSION)
    if extra:
        for k, v in extra.items():
            payload[f"extra_{k}"] = np.asarray(v)
    d = os.path.dirname(os.path.abspath(path))
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".cpt.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_checkpoint(path: str, template: State) -> Tuple[State, dict]:
    """template: a State with matching structure/shapes (from setup)."""
    data = np.load(path)
    assert int(data["format_version"]) == _FORMAT_VERSION
    leaves, treedef = jax.tree_util.tree_flatten(template)
    new_leaves = []
    for i, leaf in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        new_leaves.append(arr.astype(np.asarray(leaf).dtype)
                          if hasattr(leaf, "dtype") else arr)
    state = jax.tree_util.tree_unflatten(treedef, new_leaves)
    extra = {k[len("extra_"):]: data[k] for k in data.files
             if k.startswith("extra_")}
    return state, extra
