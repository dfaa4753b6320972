"""Device-mesh helpers.  The TPU analogue of the reference's rank layout
(reference: domdec/domdec_setup.cpp rank grids + mdrunutility/multisim.h
ensemble communicators): one mesh with an 'ens' axis (lambda windows /
replicas — multisim analogue) and a 'spatial' axis (domain decomposition
analogue); collectives ride ICI.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENS_AXIS = "ens"
SPATIAL_AXIS = "spatial"


def make_mesh(n_ens: Optional[int] = None, n_spatial: Optional[int] = None,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_ens is None and n_spatial is None:
        n_ens, n_spatial = n, 1
    elif n_ens is None:
        n_ens = n // n_spatial
    elif n_spatial is None:
        n_spatial = n // n_ens
    assert n_ens * n_spatial == n, (n_ens, n_spatial, n)
    dev = np.asarray(devices).reshape(n_ens, n_spatial)
    return Mesh(dev, (ENS_AXIS, SPATIAL_AXIS))


def ens_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(ENS_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
