"""Jitted training loop: optax Adam, grammar-filtered CE, orbax checkpoints,
JSON step logs in the reference's format.

Replaces reference train.py:140-217 / train_parallel.py:143-235. One code
path covers single-chip and multi-chip: the step is jitted with NamedSharding
constraints from parallel.mesh (batch over 'data', optional TP over 'model'),
so DDP/NCCL (train_parallel.py:145-151) becomes XLA collectives over ICI.

Improvements over the reference (kept semantics-compatible):
  * grammar mask built once as a constant (reference rebuilds per step)
  * optimizer state IS checkpointed (the reference loses Adam moments on
    resume, SURVEY.md §5.4)
  * donated buffers, bf16-optional compute, fp32 logits/loss
"""
from __future__ import annotations

import dataclasses
import json
import math
import os
from datetime import datetime
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import TrainValues
from ..data.augment import augment
from .loss import classifier_bce, filtered_cross_entropy


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int


def prefetch_to_device(iterator, size: int = 2):
    """Wrap a host batch iterator so the next batch's host->device transfer
    overlaps the current step's compute (device_put is async; a queue of
    `size` keeps one transfer in flight). On this environment's remote TPU
    tunnel the per-batch transfer is a visible fraction of the step, so the
    overlap is wall-clock, not cosmetic."""
    import collections

    queue = collections.deque()

    def put(batch):
        return tuple(jax.device_put(jnp.asarray(x)) for x in batch)

    for item in iterator:
        queue.append(put(item))
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


def make_optimizer(values: TrainValues = TrainValues()) -> optax.GradientTransformation:
    # Reference: torch.optim.Adam(lr=5e-5), default betas/eps (train.py:146).
    return optax.adam(values.learning_rate, b1=0.9, b2=0.999, eps=1e-8)


def make_lm_train_step(
    model,
    optimizer: optax.GradientTransformation,
    augmentation: bool = False,
    donate: bool = True,
    loss_chunk: int = 0,
):
    """Returns jitted (params, opt_state, src, trg, meta, rng) -> (params,
    opt_state, loss).

    loss_chunk > 0 switches to the chunked grammar-CE (the (B, T, V) logits
    are never materialized; see train.loss.chunked_filtered_cross_entropy) —
    identical loss/grads, O(T/chunk) less vocab-sized memory."""

    if loss_chunk:
        from .loss import chunked_filtered_cross_entropy

        def loss_fn(params, src, trg, meta, dropout_rng):
            hid = model.apply(
                params, src, meta, deterministic=False,
                rngs={"dropout": dropout_rng}, method="hidden",
            )
            head = params["params"]["lm_head"]
            return chunked_filtered_cross_entropy(
                src, hid, head["kernel"], head["bias"], trg,
                model.cfg.vocab_size, chunk=loss_chunk,
            )
    else:
        def loss_fn(params, src, trg, meta, dropout_rng):
            logits = model.apply(
                params, src, meta, deterministic=False, rngs={"dropout": dropout_rng}
            )
            return filtered_cross_entropy(src, logits, trg)

    def step(params, opt_state, src, trg, meta, rng):
        aug_rng, dropout_rng = jax.random.split(rng)
        if augmentation:
            src = augment(src, aug_rng)
        loss, grads = jax.value_and_grad(loss_fn)(params, src, trg, meta, dropout_rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


def make_lm_eval_step(model):
    def step(params, src, trg, meta):
        logits = model.apply(params, src, meta)
        return filtered_cross_entropy(src, logits, trg)

    return jax.jit(step)


def make_classifier_train_step(model, optimizer, donate: bool = True):
    def loss_fn(params, src, meta):
        logits = model.apply(params, src)
        return classifier_bce(logits, meta)

    def step(params, opt_state, src, meta):
        loss, grads = jax.value_and_grad(loss_fn)(params, src, meta)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


# ---------------------------------------------------------------------------
# Checkpointing (orbax) — reference naming loss_{val:.2f}_time_{ts}
# ---------------------------------------------------------------------------

def checkpoint_name(loss: float) -> str:
    now = datetime.now().strftime("%Y-%m-%d-%H-%M-%S")
    if math.isnan(loss):
        loss = float("inf")  # a NaN tag would confuse best-by-loss parsing
    return f"loss_{loss:.2f}_time_{now}"


def save_checkpoint(
    directory: str, state: TrainState, loss: float, keep: int = 3
) -> str:
    """Save params + optimizer state; prune to the newest `keep` checkpoints,
    always retaining the best-by-loss one.

    The reference keeps every .pth (train.py:69-77) precisely so the best
    run can be picked afterwards, but saves no optimizer state; with Adam
    moments included each save is ~3x params, so unpruned long runs exhaust
    disk. Compromise: prune by recency but never evict the lowest-loss
    checkpoint (parsed from the reference-format name), so a late-run
    validation regression or an interrupt-save can't destroy the best model
    (keep<=0 disables pruning)."""
    import shutil

    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(directory, checkpoint_name(loss)))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        path,
        {"params": state.params, "opt_state": state.opt_state,
         "step": np.asarray(state.step)},
    )
    ckptr.wait_until_finished()
    if keep > 0:
        entries = sorted(
            (
                os.path.join(directory, d)
                for d in os.listdir(directory)
                if d.startswith("loss_")
            ),
            key=os.path.getmtime,
        )

        def parsed_loss(p: str) -> float:
            try:
                v = float(os.path.basename(p).split("_")[1])
                return float("inf") if math.isnan(v) else v
            except (IndexError, ValueError):
                return float("inf")

        best = min(entries, key=parsed_loss) if entries else None
        for old in entries[:-keep]:
            if old == best:
                continue
            shutil.rmtree(old, ignore_errors=True)
    return path


def load_checkpoint(path: str, template: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(
        os.path.abspath(path),
        {"params": template.params, "opt_state": template.opt_state,
         "step": np.asarray(template.step)},
    )
    return TrainState(
        params=restored["params"],
        opt_state=restored["opt_state"],
        step=int(restored["step"]),
    )


# ---------------------------------------------------------------------------
# JSON step logging (reference format, train.py:148-217)
# ---------------------------------------------------------------------------

class JsonLogger:
    def __init__(self, path: Optional[str]):
        self.path = path
        self.entries = []

    def message(self, msg: str) -> None:
        self.entries.append({"timestamp": str(datetime.now()), "message": msg})
        print(msg, flush=True)

    def step(self, step: int, loss: float) -> None:
        self.entries.append({"Step": step, "Loss": f"{loss:.4f}"})
        print(f"Step: {step}, Loss: {loss:.4f}", flush=True)

    def flush(self) -> None:
        if self.path:
            os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
            with open(self.path, "w") as f:
                json.dump(self.entries, f, indent=2)


# ---------------------------------------------------------------------------
# Epoch-loop driver (CLI-level orchestration)
# ---------------------------------------------------------------------------

def train_lm(
    model,
    params,
    train_iter,
    test_iter,
    values: TrainValues = TrainValues(),
    ckpt_dir: str = "checkpoints/model",
    log_path: Optional[str] = None,
    num_epochs: Optional[int] = None,
    seed: int = 0,
    loss_chunk: int = 0,
) -> TrainState:
    """Single-process training driver (reference train.py:140-217 shape:
    epoch loop, eval on the test split per epoch, checkpoint + log flush
    every save_interval epochs and on interrupt)."""
    optimizer = make_optimizer(values)
    opt_state = optimizer.init(params)
    state = TrainState(params, opt_state, 0)
    train_step = make_lm_train_step(
        model, optimizer, values.augmentation, loss_chunk=loss_chunk
    )
    eval_step = make_lm_eval_step(model)
    logger = JsonLogger(log_path)
    rng = jax.random.PRNGKey(seed)

    epochs = num_epochs if num_epochs is not None else values.epochs
    logger.message("Training started!")
    # Until the first validation pass completes, there is no honest loss to
    # put in a checkpoint name. A crash before that point must save as
    # `loss_inf_...` (parsed_loss -> inf, never retained as best), NOT
    # `loss_0.00` — round 4's xLSTM run died at step 1 on a transport flake,
    # crash-saved near-init weights named loss_0.00, and best-val retention
    # then kept them as "best" forever, poisoning every downstream eval
    # (experiments/r4/convergence_xlstm.log).
    avg_val_loss = float("inf")
    try:
        for epoch in range(epochs):
            # Losses stay on device until the epoch summary: a float() per
            # step would serialize every step on a device->host round trip
            # (expensive over the remote tunnel); only the eval_interval
            # log line forces a sync, like the reference's print cadence.
            losses = []
            for src, trg, meta in prefetch_to_device(train_iter):
                rng, step_rng = jax.random.split(rng)
                state.params, state.opt_state, loss = train_step(
                    state.params, state.opt_state, src, trg, meta, step_rng,
                )
                state.step += 1
                losses.append(loss)
                if state.step % values.eval_interval == 0:
                    logger.step(state.step, float(loss))
            total = float(jnp.sum(jnp.stack(losses))) if losses else 0.0
            count = len(losses)
            logger.message(
                f"Epoch [{epoch+1}/{epochs}], Average Loss: {total/max(count,1):.4f}"
            )

            val_losses = [
                eval_step(state.params, src, trg, meta)
                for src, trg, meta in prefetch_to_device(test_iter)
            ]
            val_total = float(jnp.sum(jnp.stack(val_losses))) if val_losses else 0.0
            val_count = len(val_losses)
            avg_val_loss = val_total / max(val_count, 1)
            logger.message(
                f"Epoch [{epoch+1}/{epochs}], Validation Loss: {avg_val_loss:.4f}"
            )

            if (epoch + 1) % values.save_interval == 0:
                save_checkpoint(ckpt_dir, state, avg_val_loss)
                logger.flush()
    except KeyboardInterrupt:
        logger.message("Interrupted!")
    finally:
        save_checkpoint(ckpt_dir, state, avg_val_loss)
        logger.flush()
    return state
