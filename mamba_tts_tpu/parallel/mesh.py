"""Device mesh + sharding rules (the reference has no distribution — SURVEY §2.3).

Scale-out is expressed entirely through ``jax.sharding``: pick a Mesh, annotate
parameter/data shardings, and let XLA insert the collectives over ICI.  No
explicit communication code (the TPU-native equivalent of the reference's
absent NCCL/MPI story).

Tensor-parallel layout (Megatron-style, adapted to Mamba):
- The selective scan is elementwise across ``d_inner``, so the whole SSM inner
  path shards cleanly on the "model" axis: in_proj/dt_proj column-parallel,
  out_proj row-parallel, conv/A_log/D/ssm-state sharded on d_inner.
- Cross-attention: q/k/v column-parallel over heads, o_proj row-parallel.
- FFN: ff1 column-, ff2 row-parallel.
- Embeddings, LayerNorms, vocab head: replicated (they are small).

Data parallelism shards the batch axis of every array in the step.
"""
from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axes: Tuple[str, ...] = ("data", "model"),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a Mesh over the available devices.

    Default: all devices on the "data" axis, 1 on "model".
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axes) - 1)
    assert int(np.prod(shape)) == n, f"mesh shape {shape} != {n} devices"
    dev_array = np.array(devices).reshape(shape)
    return Mesh(dev_array, axes)


# Ordered (regex, PartitionSpec) rules over '/'-joined parameter paths.
# First match wins. "model" shards the tensor-parallel axis.
_PARTITION_RULES = [
    # Mamba inner path: shard d_inner.
    (r".*mamba/in_proj/kernel", P(None, "model")),
    (r".*mamba/conv_w", P(None, "model")),
    (r".*mamba/conv_b", P("model")),
    (r".*mamba/x_proj/kernel", P("model", None)),
    (r".*mamba/dt_proj/kernel", P(None, "model")),
    (r".*mamba/dt_proj/bias", P("model")),
    (r".*mamba/A_log", P("model", None)),
    (r".*mamba/D$", P("model")),
    (r".*mamba/out_proj/kernel", P("model", None)),
    # Attention: column-parallel qkv, row-parallel output.
    (r".*(q_proj|k_proj|v_proj)/kernel", P(None, "model")),
    (r".*(q_proj|k_proj|v_proj)/bias", P("model")),
    (r".*o_proj/kernel", P("model", None)),
    # FFN.
    (r".*(ff1|w_1|ffn1)/kernel", P(None, "model")),
    (r".*(ff1|w_1|ffn1)/bias", P("model")),
    (r".*(ff2|w_2|ffn2)/kernel", P("model", None)),
    # Everything else (embeddings, norms, heads, biases, style mlp): replicate.
    (r".*", P()),
]


def partition_spec_for_path(path: str) -> P:
    for pattern, spec in _PARTITION_RULES:
        if re.fullmatch(pattern, path):
            return spec
    return P()


def _path_str(key_path) -> str:
    parts = []
    for k in key_path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def param_shardings(params, mesh: Mesh):
    """PartitionSpec pytree for a parameter pytree (rule-matched by path)."""

    def spec_for(key_path, leaf):
        spec = partition_spec_for_path(_path_str(key_path))
        # Drop specs that don't fit the leaf rank or don't divide evenly.
        if len(spec) > leaf.ndim:
            return NamedSharding(mesh, P())
        for dim, axis in enumerate(spec):
            if axis is None:
                continue
            if leaf.shape[dim] % mesh.shape[axis] != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params, mesh: Mesh):
    """Place a parameter pytree onto the mesh per the partition rules."""
    shardings = param_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension of an array over ``axis``."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def shard_batch(tree, mesh: Mesh, axis: str = "data"):
    """Place a pytree of batch-leading arrays with the batch dim sharded."""
    def put(x):
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] % mesh.shape[axis] == 0:
            return jax.device_put(x, batch_sharding(mesh, x.ndim, axis))
        return jax.device_put(x, NamedSharding(mesh, P()))
    return jax.tree.map(put, tree)
