"""Device mesh construction helpers."""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def default_mesh_shape(n_devices: int, n_axes: int = 2) -> Tuple[int, ...]:
    """Factor n_devices into a near-square mesh shape, e.g. 8 -> (4, 2).

    Axis order is (dp, tp): data axis gets the larger factor since batch
    scaling is cheaper over ICI than tensor splits.
    """
    if n_axes == 1:
        return (n_devices,)
    best = (n_devices, 1)
    for tp in range(1, int(np.sqrt(n_devices)) + 1):
        if n_devices % tp == 0:
            best = (n_devices // tp, tp)
    return best


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axes: Sequence[str] = ("data",),
    devices: Optional[List[jax.Device]] = None,
) -> Mesh:
    """Build a Mesh over the available devices.

    shape=None puts every device on the first axis (1-D corpus sharding,
    the BASELINE config 5 layout); otherwise shape/axes describe a
    multi-axis layout (e.g. (4, 2) x ("dp", "tp") for train/serve).
    """
    devs = devices or jax.devices()
    if shape is None:
        shape = (len(devs),) + (1,) * (len(axes) - 1)
    n = int(np.prod(shape))
    if n > len(devs):
        raise ValueError(f"mesh shape {shape} needs {n} devices, have {len(devs)}")
    grid = np.asarray(devs[:n]).reshape(shape)
    return Mesh(grid, tuple(axes))


__all__ = ["make_mesh", "default_mesh_shape"]
