"""Device mesh + sharding layout.

Replaces the reference's torchrun/DDP/NCCL stack (reference:
train_parallel.py:17-19,143-151 and processing/dataset.py:291-297) with
single-controller JAX SPMD: a 2-D ('data', 'model') mesh over all chips,
NamedSharding annotations, and XLA-inserted collectives riding ICI.

  * 'data'  — batch axis (DDP equivalent; gradients all-reduce over ICI)
  * 'model' — optional tensor parallelism for the vocabulary-sized matrices
              (17,914 x 1024 embeddings and lm_head dominate the parameter
              count; sharding them over 'model' keeps per-chip HBM flat as
              the mesh grows)

On multi-host pods, call jax.distributed.initialize() before building the
mesh (replaces the torchrun elastic launcher, README.md:26-29).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MeshConfig, VOCAB

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(cfg: MeshConfig = MeshConfig(), devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    data, model = cfg.axis_sizes(len(devices))
    if data * model != len(devices):
        raise ValueError(
            f"mesh {data}x{model} does not cover {len(devices)} devices"
        )
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch dim over 'data'; replicate over 'model'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _param_spec(path: str, leaf: Any, vocab_size: int, tp: int) -> P:
    """Vocab-dimension tensor parallelism for the big matrices.

    lm_head kernel (d, V) / bias (V,) -> shard V over 'model';
    token embedding table (V, d) -> shard rows over 'model' (the meta table
    is small; keep replicated). V may be the raw vocab (17,914) or the
    MXU-padded one (17,920 — models build their heads at cfg.padded_vocab),
    and must divide evenly by the 'model' axis for GSPMD to shard it.
    """
    shape = getattr(leaf, "shape", ())

    def vocab_dim(n: int) -> bool:
        return n >= vocab_size and n % tp == 0

    if "lm_head" in path:
        if len(shape) == 2 and vocab_dim(shape[-1]):
            return P(None, MODEL_AXIS)
        if len(shape) == 1 and vocab_dim(shape[-1]):
            return P(MODEL_AXIS)
    if "token_embedding" in path and len(shape) == 2 and vocab_dim(shape[0]):
        return P(MODEL_AXIS, None)
    return P()


def param_shardings(params: Any, mesh: Mesh, vocab_size: int = VOCAB.vocab_size):
    """NamedSharding pytree for a model's params (TP on vocab matrices when
    the 'model' axis is >1, fully replicated otherwise)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    tp = mesh.shape[MODEL_AXIS]

    def spec_for(path_key, leaf):
        path = jax.tree_util.keystr(path_key)
        if tp <= 1:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, _param_spec(path, leaf, vocab_size, tp))

    specs = {path_key: spec_for(path_key, leaf) for path_key, leaf in flat}
    return jax.tree_util.tree_map_with_path(
        lambda path_key, leaf: specs[path_key], params
    )
