"""Device-mesh helpers for scale-out.

The reference is strictly single-device (one ``cuda:0``,
Spatial_GP_repo/utils.py:41); its scale-out story is "use fewer inducing
points".  The TPU-native equivalents are:

* a **cells** mesh axis — the data-parallel analog: independent RGC fits
  vmapped and sharded across chips (the lab fits 41+ cells from one stimulus
  set, data.py / one_cell_fit.ipynb:cell4);
* a **data** mesh axis — the tensor/sequence-parallel analog: rows of the
  (nt, ntilde) Gram and of the stimulus matrix sharded across chips, with
  XLA inserting the all-gathers/reduce-scatters over ICI for the kernel
  contractions and posterior-moment reductions.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_cells_axis: Optional[int] = None,
              n_data_axis: Optional[int] = None,
              devices=None) -> Mesh:
    """A ("cells", "data") mesh over the available devices.

    Defaults: all devices on the cells axis.  ``n_cells_axis * n_data_axis``
    must equal the device count.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_cells_axis is None and n_data_axis is None:
        n_cells_axis, n_data_axis = n, 1
    elif n_cells_axis is None:
        n_cells_axis = n // n_data_axis
    elif n_data_axis is None:
        n_data_axis = n // n_cells_axis
    if n_cells_axis * n_data_axis != n:
        raise ValueError(f"mesh {n_cells_axis}x{n_data_axis} != {n} devices")
    arr = np.asarray(devices).reshape(n_cells_axis, n_data_axis)
    return Mesh(arr, axis_names=("cells", "data"))


def population_shardings(mesh: Mesh) -> Tuple[NamedSharding, NamedSharding,
                                              NamedSharding]:
    """(x_sharding, per_cell_sharding, replicated) for population fits:
    stimuli sharded by training-point rows over "data", per-cell leaves
    sharded over "cells"."""
    x_sh = NamedSharding(mesh, P("data", None))
    cell_sh = NamedSharding(mesh, P("cells"))
    repl = NamedSharding(mesh, P())
    return x_sh, cell_sh, repl
