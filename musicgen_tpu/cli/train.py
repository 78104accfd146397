"""Training CLI (reference train.py / train_parallel.py folded into one).

  python -m musicgen_tpu.cli.train --model mamba --data data/np \
      --metadata data/metadata.json [--resume CKPT] [--parallel]

--parallel switches to the mesh-sharded SPMD step (the torchrun/DDP
equivalent); on a multi-host pod run under the TPU pod launcher after
jax.distributed.initialize().
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp

from ..config import DEFAULT_CONFIG, MeshConfig, TrainValues
from ..data.dataset import TokenDataset, make_loaders
from ..models.registry import init_params, new_model
from ..parallel.mesh import make_mesh
from ..train import trainer as T
from ..train.distributed import build_distributed_training


def main() -> None:
    from ..utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()  # kills the 2-4 min recompile on every fresh process
    p = argparse.ArgumentParser(description="Train a music generator")
    p.add_argument("--model", choices=["mamba", "xlstm", "transformer"], default="mamba")
    p.add_argument("--data", required=True, help=".npy token corpus root")
    p.add_argument("--metadata", required=True, help="metadata.json path")
    p.add_argument("--tokenizations", default=None)
    p.add_argument("--ckpt-dir", default=None)
    p.add_argument("--log", default=None)
    p.add_argument("--resume", default=None, help="checkpoint path to resume")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--block-len", type=int, default=None)
    p.add_argument("--augmentation", action="store_true")
    p.add_argument("--parallel", action="store_true", help="mesh-sharded SPMD")
    p.add_argument("--tp", type=int, default=1, help="model-axis size (with --parallel)")
    p.add_argument("--sp", type=int, default=0,
                   help="sequence-parallel long-context training: shard the "
                        "TIME axis of the mamba step over this many devices "
                        "(block_len + 6 must divide it; fp32 compute; "
                        "parallel/sp_train.py)")
    p.add_argument("--pp", type=int, default=0,
                   help="pipeline-parallel training: shard the LAYER stack "
                        "over this many devices (GPipe microbatch schedule; "
                        "params/grads/optimizer state sharded to their "
                        "stages — per-device model memory ~1/pp; mamba "
                        "only; parallel/pipeline.py)")
    p.add_argument("--pp-microbatches", type=int, default=0,
                   help="GPipe microbatch count (default: largest batch "
                        "divisor <= 4*pp for <~20%% bubble)")
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed for a TPU pod (replaces "
                        "the reference's torchrun launcher, README.md:26-29)")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 compute (fp32 params/loss; ~2x transformer "
                        "training, BENCHMARKS.md)")
    p.add_argument("--remat", action="store_true",
                   help="gradient checkpointing: recompute each layer in "
                        "the backward pass (O(n_layers) less activation "
                        "HBM; enables longer blocks / bigger batch)")
    p.add_argument("--loss-chunk", type=int, default=0,
                   help="compute the grammar-filtered CE in time chunks of "
                        "this size so the (B, T, 17914) logits never "
                        "materialize (~10x less loss memory at block 2048; "
                        "identical loss/grads)")
    p.add_argument("--attention", choices=["auto", "xla", "flash"],
                   default="auto",
                   help="transformer attention path: flash = fused Pallas "
                        "fwd+bwd kernels (TPU; default on TPU), xla = the "
                        "oracle implementation (default elsewhere)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    if args.multihost:
        jax.distributed.initialize()

    cfg = DEFAULT_CONFIG
    import dataclasses as _dc

    if args.model == "transformer":
        impl = args.attention
        if impl == "auto":
            impl = "flash" if jax.default_backend() != "cpu" else "xla"
        cfg = _dc.replace(cfg, transformer=_dc.replace(
            cfg.transformer, attention_impl=impl))
    if args.remat:
        cfg = _dc.replace(cfg, **{
            args.model: _dc.replace(getattr(cfg, args.model), remat=True)
        })
    values = TrainValues(
        block_len=args.block_len or cfg.values.block_len,
        batch_size=args.batch_size or cfg.values.batch_size,
        epochs=args.epochs or cfg.values.epochs,
        augmentation=args.augmentation,
        learning_rate=cfg.values.learning_rate,
    )
    dataset = TokenDataset.from_directory(
        args.data, args.metadata, args.tokenizations, block_len=values.block_len
    )
    train_iter, test_iter = make_loaders(dataset, values, seed=args.seed)

    import jax.numpy as jnp_

    dtype = jnp_.bfloat16 if args.bf16 else jnp_.float32
    model = new_model(args.model, cfg, dtype=dtype)
    params = init_params(model, args.model, seed=args.seed, block_len=values.block_len)

    ckpt_dir = args.ckpt_dir or os.path.join(cfg.paths.pretrained, args.model)
    log_path = args.log or os.path.join(
        cfg.paths.logs, f"training_log_{args.model}.json"
    )

    if args.resume:
        optimizer = T.make_optimizer(values)
        template = T.TrainState(params, optimizer.init(params), 0)
        state = T.load_checkpoint(args.resume, template)
        params = state.params

    if args.pp > 1:
        if args.model not in ("mamba", "transformer"):
            raise SystemExit(
                "--pp implements the mamba and transformer steps only "
                "(xLSTM needs a raw-param full-sequence stage forward for "
                "its mLSTM/sLSTM mix — not yet ported; ARCHITECTURE.md "
                "scale-axes note)"
            )
        import numpy as _np
        from jax.sharding import Mesh as _Mesh

        from ..parallel.pipeline import (
            make_pp_train_step, pp_init, pp_opt_state_unformat, pp_unformat,
        )

        pp_mesh = _Mesh(_np.asarray(jax.devices()[: args.pp]), ("pipe",))
        optimizer = T.make_optimizer(values)
        ppp, opt_state, shard, opt_shard = pp_init(
            params, optimizer, pp_mesh, model.cfg
        )
        step_fn = make_pp_train_step(
            model, optimizer, pp_mesh,
            microbatches=args.pp_microbatches or None,
            shardings=shard, opt_shardings=opt_shard,
        )
        logger = T.JsonLogger(log_path)
        logger.message(
            f"Training started! pp={args.pp} (layer-sharded GPipe)"
        )
        step_count = 0
        loss = float("nan")

        def _save():
            state = T.TrainState(
                pp_unformat(jax.device_get(ppp), model.cfg),
                pp_opt_state_unformat(jax.device_get(opt_state), model.cfg),
                step_count,
            )
            T.save_checkpoint(ckpt_dir, state, float(loss))
            logger.flush()

        try:
            for epoch in range(values.epochs):
                for src, trg, meta in train_iter:
                    ppp, opt_state, loss = step_fn(
                        ppp, opt_state,
                        jnp.asarray(src), jnp.asarray(trg), jnp.asarray(meta),
                    )
                    step_count += 1
                    if step_count % values.eval_interval == 0:
                        logger.step(step_count, float(loss))
                logger.message(
                    f"Epoch [{epoch+1}/{values.epochs}], Average Loss: "
                    f"{float(loss):.4f}"
                )
                if (epoch + 1) % values.save_interval == 0:
                    _save()
        except KeyboardInterrupt:
            logger.message("Interrupted!")
        finally:
            _save()
        return
    if args.sp > 1:
        if args.model != "mamba":
            raise SystemExit("--sp implements the mamba step only")
        import numpy as _np
        from jax.sharding import Mesh as _Mesh

        from ..parallel.sp_train import make_sp_train_step

        sp_mesh = _Mesh(_np.asarray(jax.devices()[: args.sp]), ("sp",))
        optimizer = T.make_optimizer(values)
        step_fn = make_sp_train_step(model, optimizer, sp_mesh)
        logger = T.JsonLogger(log_path)
        logger.message(f"Training started! sp={args.sp} (time-sharded)")
        state = T.TrainState(params, optimizer.init(params), 0)
        try:
            for epoch in range(values.epochs):
                for src, trg, meta in train_iter:
                    state.params, state.opt_state, loss = step_fn(
                        state.params, state.opt_state,
                        jnp.asarray(src), jnp.asarray(trg), jnp.asarray(meta),
                    )
                    state.step += 1
                    if state.step % values.eval_interval == 0:
                        logger.step(state.step, float(loss))
                logger.message(
                    f"Epoch [{epoch+1}/{values.epochs}], Average Loss: "
                    f"{float(loss):.4f}"
                )
                if (epoch + 1) % values.save_interval == 0:
                    T.save_checkpoint(ckpt_dir, state, float(loss))
                    logger.flush()
        except KeyboardInterrupt:
            logger.message("Interrupted!")
        finally:
            T.save_checkpoint(ckpt_dir, state, 0.0)
            logger.flush()
    elif args.parallel:
        mesh = make_mesh(MeshConfig(model=args.tp))
        params, opt_state, step_fn = build_distributed_training(
            model, params, mesh, values, loss_chunk=args.loss_chunk
        )
        logger = T.JsonLogger(log_path)
        logger.message(f"Training started! mesh={dict(mesh.shape)}")
        state = T.TrainState(params, opt_state, 0)
        eval_step = T.make_lm_eval_step(model)
        try:
            for epoch in range(values.epochs):
                for src, trg, meta in train_iter:
                    state.params, state.opt_state, loss = step_fn(
                        state.params, state.opt_state,
                        jnp.asarray(src), jnp.asarray(trg), jnp.asarray(meta),
                    )
                    state.step += 1
                    if state.step % values.eval_interval == 0:
                        logger.step(state.step, float(loss))
                val = sum(
                    float(eval_step(state.params, jnp.asarray(s), jnp.asarray(t), jnp.asarray(m)))
                    for s, t, m in test_iter
                ) / max(test_iter.steps_per_epoch, 1)
                logger.message(f"Epoch [{epoch+1}/{values.epochs}], Validation Loss: {val:.4f}")
                if (epoch + 1) % values.save_interval == 0:
                    T.save_checkpoint(ckpt_dir, state, val)
                    logger.flush()
        except KeyboardInterrupt:
            logger.message("Interrupted!")
        finally:
            T.save_checkpoint(ckpt_dir, state, 0.0)
            logger.flush()
    else:
        T.train_lm(
            model, params, train_iter, test_iter, values,
            ckpt_dir=ckpt_dir, log_path=log_path, seed=args.seed,
            loss_chunk=args.loss_chunk,
        )


if __name__ == "__main__":
    main()
