"""Windowed-vs-cached greedy parity + bf16 drift at full model size
(VERDICT round-2 item 6).

reference_windowed_generate reproduces the reference's exact sliding-window
re-forward semantics (scripts/generate.py:26-29) in ONE compiled shape.
With prompt_len 1024 < window 2048, the window holds the FULL history for
the first 1024 generated tokens, so the cached production sampler must
match the windowed oracle token-for-token there; afterwards the reference
semantics truncate history and the streams legitimately diverge (cached
keeps full state — Mamba state never truncates).

Also measures bf16-vs-fp32 greedy drift on the cached path (round-2
weakness 3: "does a 2000-token greedy bf16 stream drift from fp32?").

Run on the chip: python experiments/windowed_parity.py [--models mamba,transformer]
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

from musicgen_tpu.config import MambaConfig, TransformerConfig
from musicgen_tpu.data.dataset import TokenDataset
from musicgen_tpu.models.mamba import MambaLM
from musicgen_tpu.models.registry import init_params
from musicgen_tpu.models.transformer import TransformerLM
from musicgen_tpu.sample.sampler import generate, reference_windowed_generate
from musicgen_tpu.train import trainer as T

OUT = os.environ.get("MUSICGEN_OUT", "experiments/out")
PROMPT, WINDOW, TOKENS = 1024, 2048, 2000


def load(kind):
    if kind == "mamba":
        cfg = MambaConfig(ssd_impl="pallas")
        model = MambaLM(cfg)
    elif kind == "xlstm":
        from musicgen_tpu.config import XLSTMConfig
        from musicgen_tpu.models.xlstm import XLSTMLM

        model = XLSTMLM(XLSTMConfig())
    else:
        cfg = TransformerConfig()
        model = TransformerLM(cfg)
    params = init_params(model, kind, block_len=64)
    try:
        from musicgen_tpu.utils.ckpt_sanity import select_checkpoint

        ckpt = select_checkpoint(
            f"{OUT}/ckpt/{kind}",
            log_path=f"{OUT}/training_log_{kind}.json",
        )
        opt = T.make_optimizer()
        state = T.load_checkpoint(
            ckpt, T.TrainState(params, opt.init(params), 0)
        )
        params = state.params
        print(f"{kind}: loaded {ckpt}", flush=True)
    except (FileNotFoundError, RuntimeError) as e:
        # r4 lesson: a parity number on near-init weights is meaningless —
        # refuse to silently measure an untrained model.
        raise SystemExit(f"{kind}: no sane trained checkpoint ({e})")
    return model, params


def teacher_forced_choices(model, params, kind, prompt, meta, stream, window):
    """Greedy 'combined' choices of the cached path when TEACHER-FORCED on
    `stream` (the windowed oracle's own output): at every step both samplers
    see the identical history, so disagreement measures numeric/semantic
    divergence per step — not the cascade of one near-tie argmax flip that
    makes free-running greedy streams incomparable in floating point."""
    from musicgen_tpu.sample.sampler import (
        filtered_logits,
        init_penalty_state,
        make_sampler,
        penalty_divisor,
        push_token,
    )

    prefill, step = make_sampler(model, kind, window)
    b, p = prompt.shape

    @jax.jit
    def run(params, prompt, meta, stream):
        logits0, state0 = prefill(params, prompt, meta)
        pen0 = init_penalty_state(prompt, max(window, 2048))

        def body(carry, tok_t):
            logits, state, pen, last, si = carry
            w = filtered_logits(last, logits) / penalty_divisor(pen.hist)
            choice = jnp.argmax(w, -1).astype(jnp.int32)
            pen = push_token(pen, tok_t)
            logits, state = step(params, tok_t, state, si)
            return (logits, state, pen, tok_t, si + 1), choice

        carry0 = (logits0, state0, pen0, prompt[:, -1], jnp.int32(p))
        _, choices = jax.lax.scan(body, carry0, stream.T)
        return choices.transpose(1, 0)

    return np.asarray(run(params, prompt, meta, jnp.asarray(stream)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="mamba,transformer,xlstm")
    ap.add_argument("--tokens", type=int, default=TOKENS)
    args = ap.parse_args()

    ds = TokenDataset.from_directory(
        f"{OUT}/np", f"{OUT}/metadata.json", None, block_len=PROMPT
    )
    rng = np.random.default_rng(0)
    idx = rng.integers(0, len(ds), 2)
    prompt = jnp.stack([jnp.asarray(ds[int(i)][0]) for i in idx])[
        :, :PROMPT
    ].astype(jnp.int32)
    meta = jnp.stack([jnp.asarray(ds[int(i)][2]) for i in idx])

    def first_div(a, b):
        d = a != b
        return [int(np.argmax(x)) if x.any() else -1 for x in d]

    for kind in args.models.split(","):
        model, params = load(kind)
        key = jax.random.PRNGKey(0)

        t0 = time.perf_counter()
        cached = np.asarray(
            generate(model, params, kind, prompt, meta, args.tokens, WINDOW,
                     key, greedy=True, fused=False)
        )[:, PROMPT:]
        print(f"{kind}: cached fp32 {time.perf_counter()-t0:.1f}s", flush=True)

        bf16_params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            params,
        )
        t0 = time.perf_counter()
        cached_bf16 = np.asarray(
            generate(model, bf16_params, kind, prompt, meta, args.tokens,
                     WINDOW, key, greedy=True, fused=False)
        )[:, PROMPT:]
        print(f"{kind}: cached bf16 {time.perf_counter()-t0:.1f}s", flush=True)

        t0 = time.perf_counter()
        windowed = np.asarray(
            reference_windowed_generate(
                model, params, prompt, meta, args.tokens, WINDOW, key,
                greedy=True,
            )
        )[:, PROMPT:]
        print(f"{kind}: windowed oracle {time.perf_counter()-t0:.1f}s "
              f"(ONE compile, {args.tokens} full re-forwards)", flush=True)

        t0 = time.perf_counter()
        tf = teacher_forced_choices(
            model, params, kind, prompt, meta, windowed, WINDOW
        )
        print(f"{kind}: teacher-forced cached pass "
              f"{time.perf_counter()-t0:.1f}s", flush=True)

        full_hist = WINDOW - PROMPT  # tokens with complete history in window
        # Per-step agreement under identical history — the parity metric.
        # (Position t's oracle choice is windowed[t]; tf[t] is what the
        # cached path would pick from the same prefix.)
        tf_pre = (tf[:, :full_hist] == windowed[:, :full_hist]).mean()
        tf_all = (tf == windowed).mean()
        # Free-running positional agreement: dominated by near-tie argmax
        # cascades, reported for completeness only.
        pre = (cached[:, :full_hist] == windowed[:, :full_hist]).mean()
        drift = (cached == cached_bf16).mean()
        print(
            f"RESULT {kind}: teacher-forced per-step agreement "
            f"pre-truncation {tf_pre:.4f} (expect ~1.0), all-2000 {tf_all:.4f} "
            f"(post-truncation semantics legitimately differ); free-running "
            f"stream agreement pre-truncation {pre:.4f} "
            f"(first_div {first_div(cached, windowed)} — near-tie cascade); "
            f"bf16-vs-fp32 free-running agreement {drift:.4f}, "
            f"first_div {first_div(cached, cached_bf16)}",
            flush=True,
        )


if __name__ == "__main__":
    main()
