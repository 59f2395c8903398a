"""Device mesh construction.

The reference is strictly single-GPU (one device picked at main.cpp:500;
no NCCL/MPI anywhere — SURVEY.md §2.4). Scaling here is declarative JAX SPMD:
a ``jax.sharding.Mesh`` with a ``data`` axis (rays/pixels — embarrassingly
parallel) and a ``model`` axis (tensor-parallel weight sharding for wide
MLPs / expert-parallel geometry sharding), and XLA inserts the collectives
(psum over ICI for weight grads, all_gather for image assembly).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("data", "model"),
    devices=None,
) -> Mesh:
    """Build a mesh over the available devices.

    Default: all devices on the ``data`` axis (rays are independent, so data
    parallelism is the primary scaling dimension) with a trivial ``model``
    axis. Pass an explicit shape like (4, 2) for hybrid dp x tp.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} does not cover {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (ray/pixel) axis across ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def tp_mlp_shardings(params, mesh: Mesh, axis: str = "model"):
    """Tensor-parallel shardings for an MLP pytree: hidden weights sharded on
    the output feature dim, biases likewise; XLA/GSPMD inserts the activation
    collectives. Layout: w_i (in, out) -> P(None, 'model') for even layers and
    P('model', None) for odd layers (megatron-style pairing keeps a single
    psum per pair instead of an all_gather per layer)."""
    from jax.sharding import NamedSharding

    shardings = []
    n = len(params)
    for i in range(n):
        if i == n - 1:
            # head stays replicated (tiny)
            w_spec, b_spec = P(), P()
        elif i % 2 == 0:
            w_spec, b_spec = P(None, axis), P(axis)
        else:
            w_spec, b_spec = P(axis, None), P()
        shardings.append(
            type(params[i])(
                NamedSharding(mesh, w_spec), NamedSharding(mesh, b_spec)
            )
        )
    return tuple(shardings)
