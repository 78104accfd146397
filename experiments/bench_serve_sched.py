"""Drive + benchmark the continuous-batching scheduler (serve/scheduler.py)
on the real chip with a trained full-size checkpoint (--model
mamba/xlstm/transformer — the transformer runs the per-slot ring-KV
geometry step).

Compares aggregate throughput and per-request latency against the static-
batch alternative (everyone padded to the longest request — the reference's
scripts/generate_midi_combined.py behavior), decoding one result to MIDI to
close the loop.

Run: python experiments/bench_serve_sched.py [--slots 8 --tokens ...]
"""
import argparse
import glob
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from musicgen_tpu.config import DEFAULT_CONFIG
from musicgen_tpu.data.dataset import TokenDataset
from musicgen_tpu.midi import decode as midi_decode, note_to_midi
from musicgen_tpu.models.registry import init_params, new_model
from musicgen_tpu.serve import BatchScheduler
from musicgen_tpu.train import trainer as T

OUT = os.environ.get("MUSICGEN_OUT", "experiments/out")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="mamba",
                    choices=["mamba", "xlstm", "transformer"])
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument(
        "--tokens", default="2000,500,1000,250,1500,750,2000,400,600,1200"
    )
    ap.add_argument("--prompt-len", type=int, default=2048)
    ap.add_argument("--quant", default="bf16",
                    choices=["bf16", "int8w", "int8", "bf16-sb16",
                             "int8w-sb16"])
    args = ap.parse_args()
    lengths = [int(t) for t in args.tokens.split(",")]

    model = new_model(args.model, DEFAULT_CONFIG, dtype=jnp.float32)
    params = init_params(model, args.model, block_len=64)
    from musicgen_tpu.utils.ckpt_sanity import is_sane_checkpoint, parsed_loss

    # Best sane checkpoint (utils/ckpt_sanity): newest-by-mtime consumed a
    # loss_0.00 crash-save in round 4.
    ckpts = sorted(
        (p for p in glob.glob(f"{OUT}/ckpt/{args.model}/loss_*")
         if is_sane_checkpoint(p)),
        key=parsed_loss, reverse=True,
    )
    if ckpts:
        opt = T.make_optimizer()
        state = T.load_checkpoint(
            ckpts[-1], T.TrainState(params, opt.init(params), 0)
        )
        params = state.params
        print("loaded", ckpts[-1], flush=True)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )

    ds = TokenDataset.from_directory(
        f"{OUT}/np", f"{OUT}/metadata.json", None, block_len=args.prompt_len
    )
    rng = np.random.default_rng(0)
    sched = BatchScheduler(
        model, params, args.model, prompt_len=args.prompt_len,
        slots=args.slots, chunk=args.chunk, block_len=2048,
        quant=args.quant,
    )
    # Warm-up: compile prefill + chunk + insert programs outside the timed
    # region (the remote compiler costs minutes; steady-state serving is
    # what the number should measure).
    src0, _, meta0 = ds[0]
    w0 = np.asarray(src0[: args.prompt_len], np.int32)
    sched.submit(w0, np.asarray(meta0), args.chunk, seed=99)
    t0 = time.perf_counter()
    sched.run()
    print(f"warmup (compiles): {time.perf_counter()-t0:.1f}s", flush=True)

    reqs = []
    for i, n in enumerate(lengths):
        src, _, meta = ds[int(rng.integers(0, len(ds)))]
        prompt = np.asarray(src[: args.prompt_len], np.int32)
        reqs.append((sched.submit(prompt, np.asarray(meta), n, seed=i),
                     prompt, np.asarray(meta), n))

    t0 = time.perf_counter()
    results = sched.run()
    np.asarray(list(results.values())[0])
    wall = time.perf_counter() - t0
    total = sum(lengths)
    print(
        f"continuous batching: {len(lengths)} requests, {total} tokens, "
        f"slots={args.slots} chunk={args.chunk}: {wall:.1f}s = "
        f"{total/wall:,.0f} tok/s aggregate",
        flush=True,
    )

    # Static-batch alternative: pad every request to max(lengths) in
    # ceil(R/S) batches — the reference's one-shot semantics.
    static_tokens = max(lengths) * args.slots * -(-len(lengths) // args.slots)
    print(
        f"static batching would decode {static_tokens} slot-tokens for the "
        f"same work ({static_tokens/total:.2f}x waste)",
        flush=True,
    )

    rid, _, _, n = reqs[0]
    toks = results[rid]
    assert toks.shape == (n,), toks.shape
    notes = midi_decode([int(t) for t in toks])
    os.makedirs(f"{OUT}/serve", exist_ok=True)
    note_to_midi(notes, f"{OUT}/serve/served_{args.model}_0.mid")
    print(f"decoded request 0 -> {len(notes)} notes -> "
          f"{OUT}/serve/served_{args.model}_0.mid", flush=True)


if __name__ == "__main__":
    main()
