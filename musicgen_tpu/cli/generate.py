"""Generation CLI (reference scripts/generate_midi_combined.py equivalent).

  python -m musicgen_tpu.cli.generate --length 2000 --model mamba \
      --ckpt checkpoints/mamba/loss_... --data data/np/data \
      --metadata data/metadata.json --composers "Mozart, Chopin" \
      --output out/

Per composer directory: seed the sampler with dataset crops + the composer's
6 metadata tokens, generate --length tokens with the grammar+penalty sampler
(state-cached lax.scan), decode the last length+300 tokens, write
generated_{band}_{model}_{i}.mid. --no-metadata zeroes the conditioning
(reference's ablation); --retain decodes the full stream; --greedy for
deterministic output.
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DEFAULT_CONFIG
from ..data.dataset import TokenDataset
from ..midi import decode, note_to_midi
from ..models.registry import init_params, new_model
from ..sample.sampler import generate
from ..train import trainer as T


def main() -> None:
    from ..utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()  # kills the 2-4 min recompile on every fresh process
    p = argparse.ArgumentParser(description="Composer-conditioned generation")
    p.add_argument("--length", type=int, default=1000)
    p.add_argument("--model", choices=["mamba", "xlstm", "transformer"], required=True)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--data", required=True, help="corpus root of band dirs")
    p.add_argument("--metadata", required=True)
    p.add_argument("--output", default="output")
    p.add_argument("--composers", default="", help="comma-separated band names")
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--no-metadata", action="store_true")
    p.add_argument("--retain", action="store_true")
    p.add_argument("--greedy", action="store_true")
    p.add_argument("--sampler", choices=["combined", "many", "top5"],
                   default="combined",
                   help="combined: tick-window penalty + per-field top-k "
                        "(scripts/generate.py); many: 100-token count-penalty "
                        "argmax (generate_midi_many.py); top5: plain top-5 "
                        "multinomial (generate_midi.py)")
    p.add_argument("--block-len", type=int, default=None,
                   help="override the sampling window length (the reference's "
                        "generate_midi_testing.py block_len study: seed a "
                        "--prompt-len prompt into a shorter window)")
    p.add_argument("--prompt-len", type=int, default=None,
                   help="prompt crop length (defaults to block-len)")
    p.add_argument("--decode-skip", type=int, default=None,
                   help="decode stream[skip:] instead of the last "
                        "length+300 tokens (testing variant decodes [800:])")
    p.add_argument("--fused-decode",
                   choices=["auto", "on", "off", "int8", "int8w",
                            "int8w-gptq", "resident", "resident-int8w",
                            "sb16", "int8w-sb16"],
                   default="auto",
                   help="mamba fused multi-layer Pallas decode kernel "
                        "(auto: on for TPU; bf16-tolerance numerics). "
                        "int8w: weight-only int8, ~1.5x faster decode at "
                        "~2x bf16 logit noise; int8w-gptq: int8w with "
                        "GPTQ-calibrated weights (corpus Hessians, "
                        "ops/gptq.py — lower noise, one-time solve); "
                        "int8: W8A8, fastest but "
                        "noisy. resident[-int8w]: the ENTIRE token loop in "
                        "one kernel with VMEM-resident state "
                        "(ops/pallas_generate). [int8w-]sb16 (xlstm): store "
                        "the mLSTM matrix memory bf16, halving its HBM "
                        "stream — see BENCHMARKS.md)")
    p.add_argument("--reference-windowing", action="store_true",
                   help="exact reference semantics: re-forward the slid "
                        "window per token (O(window)/token; validation only)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    cfg = DEFAULT_CONFIG
    model = new_model(args.model, cfg)
    params = init_params(model, args.model)
    optimizer = T.make_optimizer()
    state = T.load_checkpoint(
        args.ckpt, T.TrainState(params, optimizer.init(params), 0)
    )
    params = state.params

    if args.composers:
        bands = [b.strip() for b in args.composers.split(",")]
    else:
        bands = [
            d for d in os.listdir(args.data)
            if os.path.isdir(os.path.join(args.data, d))
        ]

    block_len = args.block_len or cfg.values.block_len
    prompt_len = args.prompt_len or block_len

    gptq_quantizer = None
    if args.fused_decode == "int8w-gptq":
        # One-time corpus calibration + GPTQ solve (memoized per matrix);
        # the pack is built per batch size inside the band loop.
        assert args.model in ("mamba", "xlstm"), \
            "int8w-gptq packs exist for mamba and xlstm"
        from ..ops.gptq import (
            CALIB_SITES,
            XLSTM_CALIB_SITES,
            collect_hessians,
            make_gptq_quantizer,
        )

        calib_ds = TokenDataset.from_directory(
            args.data, args.metadata, block_len=512, crop="random"
        )
        # Calibration forwards are eager (the interceptor reads concrete
        # inputs) — run them on the host CPU backend, not the remote chip.
        cpu0 = jax.local_devices(backend="cpu")[0]
        params_cpu = jax.device_put(params, cpu0)
        crng = np.random.default_rng(args.seed)
        batches = []
        for _ in range(4):
            cidx = crng.integers(0, len(calib_ds), 2)
            cs = np.stack([calib_ds[int(i)][0] for i in cidx]).astype(np.int32)
            cm = np.stack([calib_ds[int(i)][2] for i in cidx]).astype(np.int32)
            batches.append(
                (jax.device_put(cs, cpu0), jax.device_put(cm, cpu0))
            )
        print("calibrating GPTQ hessians on the corpus ...")
        sites = CALIB_SITES if args.model == "mamba" else XLSTM_CALIB_SITES
        with jax.default_device(cpu0):
            gptq_quantizer = make_gptq_quantizer(
                collect_hessians(model, params_cpu, batches, sites=sites)
            )

    suffix = "_no_meta" if args.no_metadata else ""
    for band in bands:
        band_dir = os.path.join(args.data, band)
        if not os.path.isdir(band_dir):
            print(f"skipping {band}: no such directory")
            continue
        ds = TokenDataset.from_directory(
            band_dir, args.metadata, block_len=prompt_len, crop="random"
        )
        if len(ds) < 2:
            print(f"Skipping {band} (not enough files: {len(ds)})")
            continue
        out_dir = os.path.join(args.output, f"{args.model}{suffix}", band)
        os.makedirs(out_dir, exist_ok=True)

        items = [ds[i % len(ds)] for i in range(args.batch)]
        src = jnp.asarray(np.stack([s for s, _, _ in items]), jnp.int32)
        meta = jnp.asarray(np.stack([m for _, _, m in items]), jnp.int32)
        if args.no_metadata:
            meta = jnp.zeros_like(meta)

        print(f"Processing band: {band}")
        if args.reference_windowing:
            from ..sample.sampler import reference_windowed_generate

            streams = reference_windowed_generate(
                model, params, src, meta, args.length, block_len,
                jax.random.PRNGKey(args.seed), greedy=args.greedy,
                mode=args.sampler,
            )
        else:
            if args.model == "transformer" and src.shape[1] > block_len:
                # cached ring-KV holds block_len positions; seed its window
                # with the prompt tail (the windowed mode above reproduces
                # the testing variant's exact truncation semantics)
                src = src[:, -block_len:]
            fused = {"auto": None, "on": True, "off": False,
                     "int8": True, "int8w": True, "int8w-gptq": True,
                     "resident": True, "resident-int8w": True,
                     "sb16": True, "int8w-sb16": True}[args.fused_decode]
            quant = {"int8": "int8", "int8w": "int8w", "int8w-gptq": "int8w",
                     "resident-int8w": "int8w", "sb16": "bf16-sb16",
                     "int8w-sb16": "int8w-sb16"}.get(args.fused_decode, "bf16")
            resident = args.fused_decode.startswith("resident")
            decode_pack = None
            if gptq_quantizer is not None:
                if args.model == "mamba":
                    from ..ops.pallas_decode import build_decode_params as _bdp
                else:
                    from ..ops.pallas_xlstm_decode import (
                        build_xlstm_decode_params as _bdp,
                    )

                decode_pack = _bdp(
                    params, model.cfg, int(src.shape[0]), quant="int8w",
                    quantizer=gptq_quantizer,
                )
            streams = generate(
                model, params, args.model, src, meta, args.length, block_len,
                jax.random.PRNGKey(args.seed), greedy=args.greedy,
                mode=args.sampler, fused=fused, quant=quant,
                resident=resident, decode_pack=decode_pack,
            )
        streams = np.asarray(streams)
        for i in range(streams.shape[0]):
            if args.decode_skip is not None:
                toks = streams[i][args.decode_skip:]
            elif args.retain:
                toks = streams[i]
            else:
                toks = streams[i][-(args.length + 300):]
            notes = decode([int(t) for t in toks])
            path = os.path.join(out_dir, f"generated_{band}_{args.model}_{i}.mid")
            note_to_midi(notes, path)
            print(f"  wrote {path} ({len(notes)} notes)")


if __name__ == "__main__":
    main()
