"""Headline benchmark: tokens/sec/seq for a 2000-token composer-conditioned
Mamba sample (batch 2, 2048-token prompt — the reference's primary
generation workload, scripts/generate_midi_combined.py + generate.py).

Baseline: the reference's effective sampling rate is bounded at ~26
tokens/sec/seq by its no-cache full-window re-forward per token
(BASELINE.md, scripts/test_inference.ipynb). vs_baseline = value / 26.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tok/s/seq", "vs_baseline": N}
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_TOK_PER_SEC = 26.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from musicgen_tpu.config import NUM_META, VOCAB, MambaConfig
    from musicgen_tpu.models.mamba import MambaLM
    from musicgen_tpu.sample.sampler import generate

    # Full reference size; prefill runs the fused Pallas SSD kernel.
    cfg = MambaConfig(ssd_impl="pallas")
    model = MambaLM(cfg)
    rng = np.random.default_rng(0)
    batch, prompt_len, num_tokens = 2, 2048, 2000

    # Grammar-plausible prompt (field-cycled) so sampling exercises the
    # real token distribution machinery.
    def stream(n):
        out = []
        while len(out) < n:
            out.append(int(rng.integers(0, VOCAB.dyn_start)))
            out.append(int(rng.integers(VOCAB.dyn_start, VOCAB.length_start)))
            out.append(int(rng.integers(VOCAB.length_start, VOCAB.time_start)))
            if rng.random() < 0.5:
                out.append(int(rng.integers(VOCAB.time_start, VOCAB.time_start + 64)))
            out.append(int(rng.integers(VOCAB.tempo_start, VOCAB.vocab_size)))
        return out[:n]

    prompt = jnp.asarray([stream(prompt_len) for _ in range(batch)], jnp.int32)
    meta = jnp.asarray(
        rng.integers(0, cfg.metadata_vocab_size, (batch, NUM_META)), jnp.int32
    )
    params = model.init(jax.random.PRNGKey(0), prompt[:, :16], meta)

    # The real user path (sample/sampler.generate) with the RESIDENT
    # whole-generation kernel (ops/pallas_generate): the ENTIRE 2000-token
    # loop runs in ONE pallas_call — recurrent state, sampler state, grammar
    # filter, penalty window, and exact top-3 all VMEM-resident; per-token
    # HBM traffic is the bf16 weight stream only. Measured A/B vs the
    # per-token fused path at this exact workload (experiments/r4/
    # bench_resident_bf16.log): 3,759 vs 3,484 tok/s/seq — resident wins,
    # so it is the headline path. The jitted runner is cached, so only the
    # first call compiles.
    def run(params, prompt, meta, key):
        return generate(
            model, params, "mamba", prompt, meta, num_tokens, prompt_len, key,
            resident=True,
        )

    # Warmup/compile. NB: np.asarray (device->host fetch) is the sync point;
    # block_until_ready does not reliably wait on the experimental axon
    # remote platform.
    np.asarray(run(params, prompt, meta, jax.random.PRNGKey(0)))

    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        toks = np.asarray(run(params, prompt, meta, jax.random.PRNGKey(1 + i)))
    elapsed = (time.perf_counter() - t0) / reps

    per_seq = num_tokens / elapsed
    print(
        json.dumps(
            {
                "metric": "Mamba 2000-token conditioned sampling throughput "
                "(batch 2, 2048-token prompt, grammar+penalty sampler)",
                "value": round(per_seq, 2),
                "unit": "tok/s/seq",
                "vs_baseline": round(per_seq / BASELINE_TOK_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
