"""Serving CLI — continuous-batching generation over a request list.

The reference has no serving layer at all (SURVEY.md §1: "no server/serving
layer"; its closest surface is the one-shot batch script
scripts/generate_midi_combined.py where every sequence pads to the longest
request). This CLI drives serve/scheduler.BatchScheduler: a fixed slot pool
streams mixed-length requests continuously, each request's prompt seeded
from its composer's dataset crops exactly like cli.generate.

  python -m musicgen_tpu.cli.serve --model mamba --ckpt CKPT \
      --data data/np/data --metadata data/metadata.json \
      --requests '[{"composer": "Bach", "length": 2000},
                   {"composer": "Mozart", "length": 500, "seed": 3}]' \
      --output served/ [--slots 8 --chunk 32 --stats served/stats.json]

--requests takes inline JSON or a path to a JSON file: a list of
{"composer", "length", "seed"?} objects. Each completed request decodes to
MIDI (`served_{composer}_{model}_{rid}.mid`) and --stats writes per-request
latency accounting (queue wait, time-to-first-chunk, wall, tok/s) plus the
aggregate throughput.
"""
from __future__ import annotations

import argparse
import json
import os
import time

import jax
import numpy as np

from ..config import DEFAULT_CONFIG
from ..data.dataset import TokenDataset
from ..midi import decode, note_to_midi
from ..models.registry import init_params, new_model
from ..serve import BatchScheduler
from ..train import trainer as T


def main() -> None:
    from ..utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()  # kills the 2-4 min recompile on every fresh process
    p = argparse.ArgumentParser(description="Continuous-batching serving")
    p.add_argument("--model", choices=["mamba", "xlstm", "transformer"],
                   required=True)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--data", required=True, help="corpus root of band dirs")
    p.add_argument("--metadata", required=True)
    p.add_argument("--requests", required=True,
                   help="inline JSON list or a path to a JSON file")
    p.add_argument("--output", default="served")
    p.add_argument("--stats", default=None, help="write latency JSON here")
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--chunk", type=int, default=32)
    p.add_argument("--prompt-len", type=int, default=None)
    p.add_argument("--block-len", type=int, default=None)
    p.add_argument("--greedy", action="store_true")
    p.add_argument("--quant",
                   choices=["bf16", "int8w", "int8", "bf16-sb16",
                            "int8w-sb16"],
                   default="bf16",
                   help="decode numerics; '-sb16' (xlstm) additionally "
                        "stores the mLSTM matrix memory bf16, halving its "
                        "HBM stream")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    if os.path.exists(args.requests):
        with open(args.requests) as fh:
            reqs = json.load(fh)
    else:
        reqs = json.loads(args.requests)
    if not isinstance(reqs, list) or not reqs:
        raise SystemExit("--requests must be a non-empty JSON list")

    cfg = DEFAULT_CONFIG
    block_len = args.block_len or cfg.values.block_len
    prompt_len = args.prompt_len or block_len

    model = new_model(args.model, cfg)
    params = init_params(model, args.model)
    optimizer = T.make_optimizer()
    state = T.load_checkpoint(
        args.ckpt, T.TrainState(params, optimizer.init(params), 0)
    )
    params = state.params
    if jax.default_backend() != "cpu":
        import jax.numpy as jnp

        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            params,
        )

    sched = BatchScheduler(
        model, params, args.model, prompt_len=prompt_len, slots=args.slots,
        chunk=args.chunk, block_len=block_len, greedy=args.greedy,
        quant=args.quant,
    )

    # Seed each request's prompt from its composer's dataset (random crops,
    # like cli.generate) and submit everything up front — the scheduler
    # streams them through the slot pool.
    ds_cache = {}
    rid_info = {}
    for i, r in enumerate(reqs):
        band = r["composer"]
        if band not in ds_cache:
            band_dir = os.path.join(args.data, band)
            if not os.path.isdir(band_dir):
                raise SystemExit(f"no such composer directory: {band_dir}")
            ds_cache[band] = TokenDataset.from_directory(
                band_dir, args.metadata, block_len=prompt_len, crop="random",
                seed=args.seed + i,
            )
        ds = ds_cache[band]
        src, _, meta = ds[i % len(ds)]
        rid = sched.submit(
            np.asarray(src[:prompt_len], np.int32), np.asarray(meta),
            int(r["length"]), seed=int(r.get("seed", args.seed + i)),
        )
        rid_info[rid] = band

    t0 = time.perf_counter()
    results = sched.run()
    wall = time.perf_counter() - t0
    total = sum(int(r["length"]) for r in reqs)

    os.makedirs(args.output, exist_ok=True)
    for rid, toks in results.items():
        band = rid_info[rid]
        notes = decode([int(t) for t in toks])
        path = os.path.join(
            args.output, f"served_{band}_{args.model}_{rid}.mid"
        )
        note_to_midi(notes, path)
        print(f"  wrote {path} ({len(notes)} notes)", flush=True)

    stats = sched.stats()
    agg = {
        "requests": len(reqs),
        "total_tokens": total,
        "wall_s": wall,
        "aggregate_tok_per_s": total / wall,
        "per_request": {str(k): v for k, v in stats.items()},
    }
    print(
        f"served {len(reqs)} requests / {total} tokens in {wall:.1f}s = "
        f"{total/wall:,.0f} tok/s aggregate", flush=True,
    )
    if args.stats:
        with open(args.stats, "w") as fh:
            json.dump(agg, fh, indent=2)


if __name__ == "__main__":
    main()
