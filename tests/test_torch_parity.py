"""Cross-framework parity harness vs the ACTUAL reference Transformer.

Loads `/root/reference/models/transformer/model_transformer.py` (pure torch,
CPU-runnable) via importlib with a stubbed `configs.common` (the real one
hard-codes cluster paths), transplants its randomly-initialized weights into
this repo's flax TransformerLM, and asserts:

  1. full-sequence logits equality (<= 1e-4 abs, fp32 CPU both sides), in
     `attention_impl="torch_exact"` mode (keeps torch _rel_shift's wrapped
     above-diagonal BD values, visible only in meta columns of meta rows);
  2. greedy token-stream EQUALITY through the reference's sliding-window
     sampling semantics (grammar filter + tick-window penalty + argmax),
     torch loop vs `reference_windowed_generate(greedy=True)`.

This is the machine check VERDICT round 1 asked for: any drift in the
rel_shift trick, the n_embd**-0.5 scale, the meta-visible mask, the head
concat order, or the grammar/penalty tables breaks it.
"""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF_MODEL = "/root/reference/models/transformer/model_transformer.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_MODEL), reason="reference repo not present"
)

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from musicgen_tpu.config import NUM_META, VOCAB, TransformerConfig  # noqa: E402
from musicgen_tpu.models.transformer import TransformerLM  # noqa: E402


def _load_reference_transformer():
    """Import the reference model module with configs.common stubbed (the
    real one reads /scratch cluster paths at import time)."""
    cc = types.ModuleType("configs.common")
    cc.config = types.SimpleNamespace(
        values=types.SimpleNamespace(device="cpu", dropout=0.0)
    )
    cc.vocab_size = VOCAB.vocab_size
    configs_pkg = types.ModuleType("configs")
    configs_pkg.common = cc
    saved = {k: sys.modules.get(k) for k in ("configs", "configs.common")}
    sys.modules["configs"] = configs_pkg
    sys.modules["configs.common"] = cc
    try:
        spec = importlib.util.spec_from_file_location("ref_model_transformer", REF_MODEL)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod


def _small_params(vocab_size, meta_vocab, n_embd=32, n_heads=2, n_layer=2,
                  block_len=48):
    return types.SimpleNamespace(
        vocab_size=vocab_size, metadata_vocab_size=meta_vocab, n_embd=n_embd,
        n_heads=n_heads, n_layer=n_layer, block_len=block_len, dropout=0.0,
    )


def _transplant(torch_model, flax_params, p):
    """Copy the torch model's weights into the flax param tree in place.

    Layout mapping: per-head q/k/v Linears concatenate into the fused Dense
    kernels (column blocks, head-major — matching the reference's
    torch.cat([h(x) for h in heads], dim=-1) order); torch Linear weight is
    (out, in) so kernels transpose.
    """
    import flax

    params = flax.core.unfreeze(flax_params)["params"]
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    hd = p.n_embd // p.n_heads

    v = p.vocab_size  # flax pads vocab to a 128-multiple; pad rows stay 0
    params["token_embedding"]["embedding"][:v] = sd["token_embedding_table.weight"]
    params["metadata_embedding"]["embedding"][...] = sd[
        "metadata_embedding_table.weight"
    ]
    params["ln_f"]["scale"][...] = sd["ln_f.weight"]
    params["ln_f"]["bias"][...] = sd["ln_f.bias"]
    params["lm_head"]["kernel"][:, :v] = sd["lm_head.weight"].T
    params["lm_head"]["bias"][:v] = sd["lm_head.bias"]

    for i in range(p.n_layer):
        blk = params[f"block_{i}"]
        tb = f"blocks.{i}."
        blk["ln1"]["scale"][...] = sd[tb + "ln1.weight"]
        blk["ln1"]["bias"][...] = sd[tb + "ln1.bias"]
        blk["ln2"]["scale"][...] = sd[tb + "ln2.weight"]
        blk["ln2"]["bias"][...] = sd[tb + "ln2.bias"]
        for proj, tname in (("q", "query"), ("k", "key"), ("v", "value")):
            cols = [
                sd[tb + f"sa.heads.{h}.{tname}.weight"].T for h in range(p.n_heads)
            ]
            blk["attn"][proj]["kernel"][...] = np.concatenate(cols, axis=1)
        rel = np.stack(
            [sd[tb + f"sa.heads.{h}.rel_pos_emb"] for h in range(p.n_heads)]
        )
        blk["attn"]["rel_pos_emb"][...] = rel
        blk["attn"]["proj"]["kernel"][...] = sd[tb + "sa.proj.weight"].T
        blk["attn"]["proj"]["bias"][...] = sd[tb + "sa.proj.bias"]
        blk["mlp"]["fc"]["kernel"][...] = sd[tb + "ffwd.net.0.weight"].T
        blk["mlp"]["fc"]["bias"][...] = sd[tb + "ffwd.net.0.bias"]
        blk["mlp"]["out"]["kernel"][...] = sd[tb + "ffwd.net.2.weight"].T
        blk["mlp"]["out"]["bias"][...] = sd[tb + "ffwd.net.2.bias"]
    return flax.core.freeze({"params": params})


def _build_pair(p, seed=0):
    ref_mod = _load_reference_transformer()
    torch.manual_seed(seed)
    tmodel = ref_mod.Transformer(p).eval()

    cfg = TransformerConfig(
        n_embd=p.n_embd, n_heads=p.n_heads, n_layer=p.n_layer,
        block_len=p.block_len, dropout=0.0, vocab_size=p.vocab_size,
        metadata_vocab_size=p.metadata_vocab_size,
        attention_impl="torch_exact",
    )
    fmodel = TransformerLM(cfg)
    tokens0 = jnp.zeros((1, p.block_len), jnp.int32)
    meta0 = jnp.zeros((1, NUM_META), jnp.int32)
    fparams = fmodel.init(jax.random.PRNGKey(0), tokens0, meta0)
    fparams = jax.tree.map(np.array, fparams)  # mutable buffers
    fparams = _transplant(tmodel, fparams, p)
    return tmodel, fmodel, fparams


def test_logits_match_reference_torch_transformer():
    p = _small_params(vocab_size=64, meta_vocab=9)
    tmodel, fmodel, fparams = _build_pair(p)

    rng = np.random.default_rng(0)
    tokens = rng.integers(0, p.vocab_size, (2, p.block_len))
    meta = rng.integers(0, p.metadata_vocab_size, (2, NUM_META))

    with torch.no_grad():
        t_logits = tmodel(
            torch.tensor(tokens, dtype=torch.long),
            torch.tensor(meta, dtype=torch.long),
        ).numpy()
    f_logits = np.asarray(
        fmodel.apply(fparams, jnp.asarray(tokens, jnp.int32),
                     jnp.asarray(meta, jnp.int32))
    )
    assert f_logits.shape == t_logits.shape
    np.testing.assert_allclose(f_logits, t_logits, atol=1e-4, rtol=1e-4)


def test_shorter_window_logits_match():
    """The reference re-forwards windows shorter than block_len during
    sliding-window generation; parity must hold at those lengths too."""
    p = _small_params(vocab_size=64, meta_vocab=9, block_len=48)
    tmodel, fmodel, fparams = _build_pair(p, seed=1)
    rng = np.random.default_rng(1)
    for t in (7, 20, 48):
        tokens = rng.integers(0, p.vocab_size, (1, t))
        meta = rng.integers(0, p.metadata_vocab_size, (1, NUM_META))
        with torch.no_grad():
            t_logits = tmodel(
                torch.tensor(tokens, dtype=torch.long),
                torch.tensor(meta, dtype=torch.long),
            ).numpy()
        f_logits = np.asarray(
            fmodel.apply(fparams, jnp.asarray(tokens, jnp.int32),
                         jnp.asarray(meta, jnp.int32))
        )
        np.testing.assert_allclose(
            f_logits, t_logits, atol=1e-4, rtol=1e-4,
            err_msg=f"window length {t}",
        )


def _torch_greedy_reference(tmodel, tokens, meta, num_tokens, context_len):
    """Literal transliteration of scripts/generate.py:26-89 with greedy picks
    (k=1): grammar filter, tick-window penalty, argmax, window slide."""
    from tests.test_grammar import _torch_reference_mask
    import torch.nn.functional as F

    mask5 = torch.tensor(_torch_reference_mask())
    boundaries = torch.tensor(list(VOCAB.field_boundaries))
    token_ids = torch.tensor(tokens, dtype=torch.long)
    meta_ids = torch.tensor(meta, dtype=torch.long)
    generated = token_ids[0].tolist()
    out = []
    with torch.no_grad():
        for _ in range(num_tokens):
            logits = tmodel(token_ids, meta_ids)
            prev = token_ids[:, -1]
            w = (-F.log_softmax(logits[:, -1, :], dim=-1)) * mask5[
                torch.bucketize(prev, boundaries, right=False)
            ]
            # penalty window: suffix whose cumulative time-ticks reach 64*16
            val, j = 0, 0
            for j, tok in enumerate(reversed(generated)):
                if VOCAB.time_start <= tok < VOCAB.tempo_start:
                    val += tok - VOCAB.time_start
                if val >= 64 * 16:
                    break
            recent = generated[-j:] if j > 0 else []
            counts = {}
            for tok in recent:
                counts[tok] = counts.get(tok, 0) + 1
            for tok, count in counts.items():
                if tok < VOCAB.dyn_start:
                    w[0, tok] /= min(1.01 ** count, 1.2)
                elif tok < VOCAB.length_start:
                    w[0, tok] /= min(1.02 ** count, 1.2)
            nxt = int(torch.argmax(w[0]))
            out.append(nxt)
            generated.append(nxt)
            token_ids = torch.cat(
                [token_ids, torch.tensor([[nxt]], dtype=torch.long)], dim=1
            )[:, -context_len:]
    return out


def test_greedy_stream_equality_vs_torch():
    """End-to-end greedy token streams are IDENTICAL between the torch
    reference loop and reference_windowed_generate, including after the
    window starts sliding (prompt 48 = block_len, 30 generated tokens)."""
    from musicgen_tpu.sample.sampler import reference_windowed_generate
    from tests.test_sampler import _random_stream

    p = _small_params(
        vocab_size=VOCAB.vocab_size, meta_vocab=9, n_embd=32, n_heads=2,
        n_layer=1, block_len=48,
    )
    tmodel, fmodel, fparams = _build_pair(p, seed=2)

    rng = np.random.default_rng(3)
    prompt = np.asarray([_random_stream(rng, 48)])
    meta = rng.integers(0, 9, (1, NUM_META))

    expected = _torch_greedy_reference(tmodel, prompt, meta, 30, p.block_len)
    got = reference_windowed_generate(
        fmodel, fparams, jnp.asarray(prompt, jnp.int32),
        jnp.asarray(meta, jnp.int32), 30, p.block_len,
        jax.random.PRNGKey(0), greedy=True,
    )
    np.testing.assert_array_equal(np.asarray(got)[0, 48:], np.asarray(expected))
