"""Multi-chip training: jit over a ('data','model') mesh with explicit
NamedShardings — the TPU-native replacement for torchrun+DDP+NCCL
(reference: train_parallel.py:143-235, README.md:26-29).

Parameters are replicated (or vocab-sharded over 'model' when TP is on),
batches are sharded over 'data', and XLA GSPMD inserts the gradient
all-reduce / all-gather collectives over ICI automatically — the
single-controller equivalent of DDP's bucketed ring all-reduce.
"""
from __future__ import annotations

from typing import Any

import jax
import optax
from jax.sharding import Mesh

from ..config import TrainValues
from ..parallel.mesh import batch_sharding, param_shardings, replicated
from .loss import classifier_bce, filtered_cross_entropy
from .trainer import make_optimizer


def shard_train_state(params: Any, opt_state: Any, mesh: Mesh):
    """Place params/opt_state on the mesh (TP-aware for vocab matrices)."""
    pspec = param_shardings(params, mesh)
    params = jax.device_put(params, pspec)
    opt_state = jax.device_put(
        opt_state,
        jax.tree.map(
            lambda _: replicated(mesh), opt_state,
            is_leaf=lambda x: hasattr(x, "shape"),
        ),
    )
    return params, opt_state


def make_distributed_train_step(
    model,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    params_template: Any,
    kind: str = "lm",
    loss_chunk: int = 0,
):
    """Jitted SPMD train step with explicit in/out shardings.

    kind='lm' — grammar-filtered CE over (src, trg, meta) for the three
    generators (reference train_parallel.py:143-235 trains every type under
    DDP; any generator's step runs on any mesh here).
    kind='classifier' — multi-label BCE; meta is the multi-hot target
    source, trg is ignored (reference train_classifier.py:84-88).
    loss_chunk > 0 uses the chunked grammar-CE (loss.py) — identical
    loss/grads, no (B, T, V) logits materialized per device.
    """
    pspec = param_shardings(params_template, mesh)
    bspec = batch_sharding(mesh)
    rspec = replicated(mesh)

    if kind == "classifier":
        def loss_fn(params, src, trg, meta):
            return classifier_bce(model.apply(params, src), meta)
    elif loss_chunk:
        from .loss import chunked_filtered_cross_entropy

        def loss_fn(params, src, trg, meta):
            hid = model.apply(params, src, meta, method="hidden")
            head = params["params"]["lm_head"]
            return chunked_filtered_cross_entropy(
                src, hid, head["kernel"], head["bias"], trg,
                model.cfg.vocab_size, chunk=loss_chunk,
            )
    else:
        def loss_fn(params, src, trg, meta):
            logits = model.apply(params, src, meta)
            return filtered_cross_entropy(src, logits, trg)

    def step(params, opt_state, src, trg, meta):
        loss, grads = jax.value_and_grad(loss_fn)(params, src, trg, meta)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    opt_struct = jax.eval_shape(optimizer.init, params_template)
    opt_spec = jax.tree.map(lambda x: rspec, opt_struct)

    return jax.jit(
        step,
        in_shardings=(pspec, opt_spec, bspec, bspec, bspec),
        out_shardings=(pspec, opt_spec, rspec),
        donate_argnums=(0, 1),
    )


def build_distributed_training(
    model,
    params,
    mesh: Mesh,
    values: TrainValues = TrainValues(),
    kind: str = "lm",
    loss_chunk: int = 0,
):
    """Convenience: returns (sharded_params, sharded_opt_state, step_fn)."""
    optimizer = make_optimizer(values)
    opt_state = optimizer.init(params)
    step_fn = make_distributed_train_step(
        model, optimizer, mesh, params, kind=kind, loss_chunk=loss_chunk
    )
    params, opt_state = shard_train_state(params, opt_state, mesh)
    return params, opt_state, step_fn
