"""Classifier training CLI (reference train_classifier.py equivalent):
multi-label BCE over the sample's metadata-token set, xLSTM-512 trunk.

  python -m musicgen_tpu.cli.train_classifier --data data/np \
      --metadata data/metadata.json
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp

from ..config import DEFAULT_CONFIG, TrainValues
from ..data.dataset import TokenDataset, make_loaders
from ..models.registry import init_params, new_model
from ..train import trainer as T
from ..train.loss import classifier_bce


def main() -> None:
    from ..utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()  # kills the 2-4 min recompile on every fresh process
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True)
    p.add_argument("--metadata", required=True)
    p.add_argument("--distribution", default=None,
                   help="data_distribution.json with explicit train/test "
                        "file lists (reference train_classifier.py:52-57)")
    p.add_argument("--ckpt-dir", default=None)
    p.add_argument("--log", default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    cfg = DEFAULT_CONFIG
    values = TrainValues(
        batch_size=args.batch_size or cfg.values.batch_size,
        epochs=args.epochs or cfg.values.epochs,
    )
    if args.distribution:
        import json as _json

        with open(args.distribution) as f:
            dist = _json.load(f)
        from ..data.dataset import BatchIterator
        import numpy as _np

        train_ds = TokenDataset.from_file_list(
            dist["train"], args.metadata, block_len=cfg.classifier.context_length
        )
        test_ds = TokenDataset.from_file_list(
            dist["test"], args.metadata, block_len=cfg.classifier.context_length
        )
        train_iter = BatchIterator(
            train_ds, _np.arange(len(train_ds)), values.batch_size, args.seed
        )
        test_iter = BatchIterator(
            test_ds, _np.arange(len(test_ds)), values.batch_size, args.seed + 1
        )
    else:
        dataset = TokenDataset.from_directory(
            args.data, args.metadata, block_len=cfg.classifier.context_length
        )
        train_iter, test_iter = make_loaders(dataset, values, seed=args.seed)

    model = new_model("classifier", cfg)
    params = init_params(model, "classifier")
    optimizer = T.make_optimizer(values)
    opt_state = optimizer.init(params)
    step = T.make_classifier_train_step(model, optimizer)
    eval_loss = jax.jit(
        lambda p, src, meta: classifier_bce(model.apply(p, src), meta)
    )

    ckpt_dir = args.ckpt_dir or os.path.join(cfg.paths.pretrained, "classifier")
    log_path = args.log or os.path.join(cfg.paths.logs, "training_log_classifier.json")
    logger = T.JsonLogger(log_path)
    state = T.TrainState(params, opt_state, 0)
    logger.message("Training started!")
    val = 0.0
    try:
        for epoch in range(values.epochs):
            for src, _, meta in train_iter:
                state.params, state.opt_state, loss = step(
                    state.params, state.opt_state, jnp.asarray(src), jnp.asarray(meta)
                )
                state.step += 1
                if state.step % values.eval_interval == 0:
                    logger.step(state.step, float(loss))
            vals = [
                float(eval_loss(state.params, jnp.asarray(s), jnp.asarray(m)))
                for s, _, m in test_iter
            ]
            val = sum(vals) / max(len(vals), 1)
            logger.message(f"Epoch [{epoch+1}/{values.epochs}], Validation Loss: {val:.4f}")
            if (epoch + 1) % values.save_interval == 0:
                T.save_checkpoint(ckpt_dir, state, val)
                logger.flush()
    except KeyboardInterrupt:
        logger.message("Interrupted!")
    finally:
        T.save_checkpoint(ckpt_dir, state, val)
        logger.flush()


if __name__ == "__main__":
    main()
