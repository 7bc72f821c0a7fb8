"""Mesh construction and multi-host initialization.

The reference is single-process shared-memory (SURVEY.md #28); this module is
the TPU-native communication story: ICI within a slice (``batch`` x ``poly``
axes), DCN across slices (an outer ``dp`` axis when more than one slice is
present).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """`jax.distributed.initialize` wrapper; no-op when single-process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def create_mesh(shape: Optional[Tuple[int, ...]] = None,
                axis_names: Sequence[str] = ("batch", "poly"),
                devices=None) -> Mesh:
    """Mesh over `devices` (default: all).  With the default 2-D axes, the
    ``poly`` extent is chosen as the largest power of two <= 2 that divides
    the device count unless an explicit shape is given."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    n = devices.size
    if shape is None:
        if len(axis_names) == 1:
            shape = (n,)
        else:
            poly = 2 if n % 2 == 0 and n > 1 else 1
            shape = (n // poly, poly) + (1,) * (len(axis_names) - 2)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != device count {n}")
    return Mesh(devices.reshape(shape), tuple(axis_names))


def local_mesh(n: Optional[int] = None,
               axis_names: Sequence[str] = ("batch", "poly")) -> Mesh:
    """Mesh over the first n local devices."""
    devs = jax.devices()
    if n is not None:
        devs = devs[:n]
    return create_mesh(axis_names=axis_names, devices=devs)
