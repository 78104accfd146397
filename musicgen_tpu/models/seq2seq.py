"""Seq2seq tutorial transformer (reference parity: the one component the
round-2 inventory left out).

Reference: models/transformer/simple_transformer.py (253 lines) — an
encoder-decoder "TransformerTranslator" vendored from a tutorial. It is
dead code there (never imported by training, sampling, or the notebooks),
but it IS part of the reference surface, so this module provides the same
model family with the same API shape: `encode()` once over the source
sequence, then autoregressive decoder calls that attend the cached encoder
output.

Design departures (TPU-idiomatic, not a translation):
  * One fused QKV projection per block, heads via reshape — the reference
    loops a ModuleList of per-head SelfAttention modules and torch.cat's
    the outputs (simple_transformer.py:43-62); a per-head Python loop is
    exactly what XLA cannot tile onto the MXU.
  * Stateless/functional: encode() returns the memory; the reference
    stores `self.encode_out` on the module (simple_transformer.py:243-246).
  * jnp.take positional table, static shapes, no data-dependent control
    flow — jit-compiles to a single program for both phases.

Faithfully-kept reference quirks (they define this model family's
behavior, each cited):
  * Attention is UNMASKED everywhere — both encoder and decoder pass
    mask=False (simple_transformer.py:172,194,199); causality comes only
    from the decoder querying the LAST position of the running output
    sequence (simple_transformer.py:209 `query=x[:, -1:, :]`).
  * The Annotated-Transformer-style LayerNorm divides by
    (std + eps) + shift — the learned shift lands in the DIVISOR, not the
    output (simple_transformer.py:74-78).
  * Output head returns log_softmax logits (simple_transformer.py:118-124).
  * Embeddings are scaled by sqrt(d) and the positional encoding is added
    to the ALREADY position-encoded embed twice in Encoder.forward
    (Embeddings adds pe, Encoder adds pe again —
    simple_transformer.py:136-138 + 179-182).
  * The sinusoid table uses pow(10000, i/d) as a DIVISOR via
    sin(position * div_term) with div_term = 10000^(i/d) (not the
    canonical 10000^(-i/d)) — simple_transformer.py:148-156.
"""
from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax.numpy as jnp


@dataclass(frozen=True)
class Seq2SeqConfig:
    """Tutorial-scale defaults (the reference file hard-codes none; its
    class args mirror these)."""

    embed_dim: int = 256
    num_blocks: int = 2
    num_heads: int = 4
    encoder_vocab_size: int = 1024
    output_vocab_size: int = 1024
    max_len: int = 5000
    dropout: float = 0.1


def _sinusoid_table(max_len: int, d: int) -> jnp.ndarray:
    """simple_transformer.py:144-160 — note 10000^(i/d) multiplies the
    position (the tutorial's inverted exponent), kept verbatim."""
    pos = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    even = jnp.power(10000.0, jnp.arange(0, d, 2, dtype=jnp.float32) / d)
    odd = jnp.power(10000.0, jnp.arange(1, d, 2, dtype=jnp.float32) / d)
    pe = jnp.zeros((max_len, d), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(pos * even[None, :]))
    pe = pe.at[:, 1::2].set(jnp.cos(pos * odd[None, :]))
    return pe


class TutorialLayerNorm(nn.Module):
    """scale * (x - mean) / ((std + eps) + shift) —
    simple_transformer.py:65-78 (shift in the divisor)."""

    features: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        shift = self.param("shift", nn.initializers.zeros, (self.features,))
        mean = jnp.mean(x, -1, keepdims=True)
        # torch .std() is the Bessel-corrected sample std.
        var = jnp.var(x, -1, keepdims=True) * (
            self.features / (self.features - 1)
        )
        return scale * (x - mean) / ((jnp.sqrt(var) + self.eps) + shift)


class MultiHeadAttention(nn.Module):
    """Unmasked scaled-dot attention, all heads in one (B, T, H, Dh)
    einsum (vs the reference's per-head module loop +
    torch.cat, simple_transformer.py:43-62). Post-norm residual add."""

    cfg: Seq2SeqConfig

    @nn.compact
    def __call__(self, query_in, key_in, value_in, residual_x,
                 deterministic=True):
        c = self.cfg
        dh = c.embed_dim // c.num_heads
        proj = lambda name: nn.DenseGeneral(
            (c.num_heads, dh), axis=-1, name=name
        )
        q = proj("query")(query_in)  # (B, Tq, H, Dh)
        k = proj("key")(key_in)
        v = proj("value")(value_in)
        w = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(float(dh))
        w = nn.softmax(w, axis=-1)  # mask=False everywhere (ref :172,194)
        o = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(
            *q.shape[:2], c.embed_dim
        )
        o = nn.Dropout(c.dropout)(o, deterministic=deterministic)
        return TutorialLayerNorm(c.embed_dim)(o + residual_x)


class FeedForward(nn.Module):
    """relu(relu(l1(x))) -> l2 -> dropout -> add&norm. The double ReLU is
    the reference's torch.max(0, .) followed by RELU
    (simple_transformer.py:90-96) — idempotent, kept for exactness."""

    cfg: Seq2SeqConfig

    @nn.compact
    def __call__(self, x, residual_x, deterministic=True):
        c = self.cfg
        h = nn.relu(nn.Dense(c.embed_dim, name="l1")(x))
        h = nn.relu(h)
        h = nn.Dense(c.embed_dim, name="l2")(h)
        h = nn.Dropout(c.dropout)(h, deterministic=deterministic)
        return TutorialLayerNorm(c.embed_dim)(h + residual_x)


class TransformerBlock(nn.Module):
    cfg: Seq2SeqConfig

    @nn.compact
    def __call__(self, query, key, value, residual_x, deterministic=True):
        a = MultiHeadAttention(self.cfg, name="mha")(
            query, key, value, residual_x, deterministic
        )
        return FeedForward(self.cfg, name="ff")(a, a, deterministic)


class Seq2SeqTransformer(nn.Module):
    """Functional TransformerTranslator (simple_transformer.py:220-254).

    encode(src) -> memory; decode(memory, out_prefix) -> (B, 1, V)
    log-probs for the next token (the reference decoder queries only the
    last output position, :209)."""

    cfg: Seq2SeqConfig

    def setup(self):
        c = self.cfg
        self.src_embed = nn.Embed(c.encoder_vocab_size, c.embed_dim)
        self.out_embed = nn.Embed(c.output_vocab_size, c.embed_dim)
        self.pe = _sinusoid_table(c.max_len, c.embed_dim)
        self.enc_blocks = [
            TransformerBlock(c, name=f"enc_{i}") for i in range(c.num_blocks)
        ]
        self.dec_self = MultiHeadAttention(c, name="dec_self")
        self.dec_blocks = [
            TransformerBlock(c, name=f"dec_{i}") for i in range(c.num_blocks)
        ]
        self.head = nn.Dense(c.output_vocab_size, name="vocab_logits")

    def _embed(self, table, tokens):
        x = table(tokens) * jnp.sqrt(float(self.cfg.embed_dim))
        return x + self.pe[None, : tokens.shape[1]]

    def encode(self, src_tokens, deterministic=True):
        # Embeddings adds pe once, Encoder.forward adds it AGAIN
        # (simple_transformer.py:138+180) — kept.
        x = self._embed(self.src_embed, src_tokens)
        x = x + self.pe[None, : src_tokens.shape[1]]
        for blk in self.enc_blocks:
            x = blk(x, x, x, x, deterministic)
        return x

    def decode(self, memory, out_tokens, deterministic=True):
        x = self._embed(self.out_embed, out_tokens)
        for blk in self.dec_blocks:
            q = x[:, -1:, :]
            # Self-attention over the full output prefix, query = last
            # position only; then cross-attention into the encoder memory
            # (simple_transformer.py:206-216). NB the reference re-uses ONE
            # self-attention module across blocks and never reassigns x to
            # a longer sequence — after the first block x is (B, 1, D).
            a = self.dec_self(q, x, x, q, deterministic)
            x = blk(a, memory, memory, a, deterministic)
        return nn.log_softmax(self.head(x), axis=-1)

    def __call__(self, src_tokens, out_tokens, deterministic=True):
        """Convenience: encode + decode in one jittable call."""
        return self.decode(
            self.encode(src_tokens, deterministic), out_tokens, deterministic
        )
