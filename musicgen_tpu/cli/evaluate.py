"""Evaluation CLI — the reference's Test Accuracy / test_classifier
notebooks as commands (reference: scripts/Test Accuracy.ipynb,
scripts/test_classifier.ipynb; SURVEY.md §4).

  # per-field next-token accuracy of a generator checkpoint
  python -m musicgen_tpu.cli.evaluate accuracy --model mamba --ckpt ... \
      --data data/np --metadata data/metadata.json [--batches 50]

  # classifier success-rate over a corpus (real or generated)
  python -m musicgen_tpu.cli.evaluate classifier --ckpt ... \
      --data output/mamba --metadata data/metadata.json --band-start 314
"""
from __future__ import annotations

import argparse
import json

import jax.numpy as jnp
import numpy as np

from ..config import DEFAULT_CONFIG, TrainValues
from ..data.dataset import TokenDataset, full_batches, make_loaders
from ..eval.accuracy import evaluate_accuracy
from ..eval.classifier_eval import evaluate_success_rates
from ..eval.timing import time_forward
from ..models.registry import init_params, new_model
from ..train import trainer as T


def _load(kind, ckpt):
    cfg = DEFAULT_CONFIG
    model = new_model(kind, cfg)
    params = init_params(model, kind)
    optimizer = T.make_optimizer()
    state = T.load_checkpoint(ckpt, T.TrainState(params, optimizer.init(params), 0))
    return model, state.params


def main() -> None:
    from ..utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()  # kills the 2-4 min recompile on every fresh process
    p = argparse.ArgumentParser(description="Evaluation harnesses")
    sub = p.add_subparsers(dest="cmd", required=True)

    pa = sub.add_parser("accuracy")
    pa.add_argument("--model", choices=["mamba", "xlstm", "transformer"], required=True)
    pa.add_argument("--ckpt", required=True)
    pa.add_argument("--data", required=True)
    pa.add_argument("--metadata", required=True)
    pa.add_argument("--batches", type=int, default=None,
                    help="subsample N random test batches; default is the "
                         "reference protocol: one deterministic full pass "
                         "over the corpus (Test Accuracy.ipynb, "
                         "get_dataloader_full(shuffle=False))")
    pa.add_argument("--block-len", type=int, default=2048)
    pa.add_argument("--repeats", type=int, default=1,
                    help="random-crop passes over the corpus (random crops "
                         "give a fresh last position per pass; >1 thickens "
                         "the per-field sample counts on small corpora)")
    pa.add_argument("--crop", choices=["random", "start", "end"],
                    default="random",
                    help="per-file crop (reference ships random; end gives "
                         "a fully deterministic pass)")
    pa.add_argument("--out", default=None)

    pc = sub.add_parser("classifier")
    pc.add_argument("--ckpt", required=True)
    pc.add_argument("--data", required=True)
    pc.add_argument("--metadata", required=True)
    pc.add_argument("--band-start", type=int, required=True,
                    help="first band token id (reference uses 314)")
    pc.add_argument("--batches", type=int, default=None,
                    help="subsample N random batches; default: one full "
                         "deterministic pass (test_classifier.ipynb protocol)")
    pc.add_argument("--out", default=None)

    pt = sub.add_parser("timing")
    pt.add_argument("--model", choices=["mamba", "xlstm", "transformer"], required=True)
    pt.add_argument("--ckpt", default=None)
    pt.add_argument("--iters", type=int, default=100)

    args = p.parse_args()
    cfg = DEFAULT_CONFIG

    if args.cmd == "accuracy":
        model, params = _load(args.model, args.ckpt)
        ds = TokenDataset.from_directory(args.data, args.metadata,
                                         block_len=args.block_len,
                                         crop=args.crop)
        if args.batches is None:
            def _repeat_passes():
                for _ in range(max(args.repeats, 1)):
                    yield from full_batches(ds, cfg.values.batch_size)

            batches = _repeat_passes()
        else:
            _, test_iter = make_loaders(ds, TrainValues(block_len=args.block_len))
            batches = (test_iter.sample_batch() for _ in range(args.batches))
        acc = evaluate_accuracy(
            lambda p_, s, m: model.apply(p_, s, m), params, batches
        )
        print(json.dumps(acc, indent=2))
        if args.out:
            with open(args.out, "w") as f:
                json.dump(acc, f, indent=2)

    elif args.cmd == "classifier":
        model, params = _load("classifier", args.ckpt)
        ds = TokenDataset.from_directory(
            args.data, args.metadata, block_len=cfg.classifier.context_length
        )
        if args.batches is None:
            raw = full_batches(ds, cfg.values.batch_size)
        else:
            _, test_iter = make_loaders(
                ds, TrainValues(block_len=cfg.classifier.context_length)
            )
            raw = (test_iter.sample_batch() for _ in range(args.batches))
        batches = ((b[0], b[2]) for b in raw)
        rates = evaluate_success_rates(
            lambda p_, t_: model.apply(p_, t_), params, batches, args.band_start
        )
        overall = float(np.mean(list(rates.values()))) if rates else float("nan")
        print(json.dumps({"per_band": rates, "mean": overall}, indent=2))
        if args.out:
            with open(args.out, "w") as f:
                json.dump({"per_band": rates, "mean": overall}, f, indent=2)

    elif args.cmd == "timing":
        model = new_model(args.model, cfg)
        params = init_params(model, args.model)
        if args.ckpt:
            _, params = _load(args.model, args.ckpt)
        rng = np.random.default_rng(0)
        src = jnp.asarray(rng.integers(0, cfg.transformer.vocab_size, (2, 2048)), jnp.int32)
        meta = jnp.zeros((2, 6), jnp.int32)
        stats = time_forward(
            lambda p_, s, m: model.apply(p_, s, m), params, src, meta, args.iters
        )
        print(json.dumps(stats, indent=2))


if __name__ == "__main__":
    main()
