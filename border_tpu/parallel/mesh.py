"""Device mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    axis_names: Sequence[str] = ("actors",),
    shape: Optional[Tuple[int, ...]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a Mesh over the available devices.

    Default: all local devices on one ``actors`` axis — the env/data-parallel
    axis that replaces the reference's actor-thread pool.  Multi-axis shapes
    (e.g. ``("hosts", "chips")`` or ``("actors", "model")``) slice the device
    list row-major, so the trailing axis rides the fastest interconnect.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        if len(axis_names) != 1:
            raise ValueError("shape is required for multi-axis meshes")
        shape = (len(devices),)
    if int(np.prod(shape)) != len(devices):
        raise ValueError(
            f"mesh shape {shape} does not cover {len(devices)} devices"
        )
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))
