"""Device mesh construction helpers."""

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(dp: Optional[int] = None, tp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('dp', 'tp') mesh over the available devices.

    dp defaults to n_devices // tp. On a physical TPU slice the device order
    from jax.devices() follows the ICI topology, so contiguous tp groups
    ride the fastest links.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % tp != 0:
        raise ValueError(f"{n} devices not divisible by tp={tp}")
    dp = dp if dp is not None else n // tp
    if dp * tp != n:
        devices = devices[: dp * tp]
    arr = np.array(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def single_device_mesh() -> Mesh:
    return Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("dp", "tp"))
