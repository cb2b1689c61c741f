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


def validate_mesh_shape(mesh_shape, llm_weight_format=None):
    """Validate an engine ``mesh_shape`` dict; returns ``(dp, tp)``.

    Single source of truth for the facade constructor and
    ModelManager.initialize (the facade validates early so config errors
    raise with their message instead of the generic init failure).
    """
    ms = dict(mesh_shape)
    dp, tp = ms.pop("dp", 1), ms.pop("tp", 1)
    if ms:
        raise ValueError(f"mesh_shape has unknown axes {sorted(ms)}; "
                         "expected 'dp' and/or 'tp'")
    if not isinstance(dp, int) or not isinstance(tp, int) \
            or dp < 1 or tp < 1:
        raise ValueError(f"mesh_shape axes must be positive ints, got "
                         f"dp={dp!r} tp={tp!r}")
    if llm_weight_format == "q8_0":
        raise ValueError(
            "mesh_shape with llm_weight_format='q8_0' is not supported "
            "(the per-block Pallas kernels are single-chip); use 'int8' "
            "or 'bf16'")
    return dp, tp
