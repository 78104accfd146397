"""Batch-parallel (data-sharded) generation over a device mesh.

The reference has no distributed sampling (scripts/generate.py is a
single-GPU host loop); on TPU the sampler is a jitted lax.scan whose batch
dim shards cleanly over the mesh's 'data' axis: params replicate, each chip
decodes its batch shard, and the only cross-chip traffic is the (tiny)
replicated RNG key stream. Throughput scales linearly with 'data' because
each chip streams the full weight set from its own HBM — the same roofline
as single-chip serving (ops/pallas_decode.py docstring).

Usage:
    prompt, meta, params = shard_for_generation(mesh, prompt, meta, params)
    out = sampler.generate(model, params, kind, prompt, meta, ...)

jax.jit propagates the committed input shardings through the scan, so the
same `generate` entry point serves both single-chip and mesh execution;
tests/test_distributed_generate.py asserts the streams are identical.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax

from .mesh import batch_sharding, param_shardings


def shard_for_generation(
    mesh, prompt: jax.Array, meta: jax.Array, params: Any
) -> Tuple[jax.Array, jax.Array, Any]:
    """Commit prompt/meta to the 'data' axis and params to their mesh
    layout (replicated, or vocab-sharded when the 'model' axis > 1).

    The batch must divide by the 'data' axis size."""
    data = mesh.shape["data"]
    if prompt.shape[0] % data:
        raise ValueError(
            f"batch {prompt.shape[0]} does not divide data axis {data}"
        )
    bspec = batch_sharding(mesh)
    prompt = jax.device_put(prompt, bspec)
    meta = jax.device_put(meta, bspec)
    params = jax.device_put(params, param_shardings(params, mesh))
    return prompt, meta, params
