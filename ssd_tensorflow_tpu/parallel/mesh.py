"""Mesh construction helpers."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(data: int | None = None, model: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'model') mesh.

    Args:
      data:  size of the data axis; defaults to ``n_devices // model``.
      model: size of the model (tensor-parallel) axis, default 1.
      devices: explicit device list (defaults to ``jax.devices()``).

    The default is pure data parallelism over every visible device —
    the right regime for VGG-scale detection (SURVEY.md §2.4).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(
            f"mesh {data}x{model} needs {data * model} devices, have {n}"
        )
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, axis_names=("data", "model"))
