"""Decoder-only Transformer generator with relative-position attention.

TPU-native counterpart of the reference Transformer
(reference: models/transformer/model_transformer.py:136-168):

  tokens -> embed; 6 metadata tokens -> embed, PREPENDED along sequence;
  8 x pre-LN blocks {multi-head rel-pos attention, 4x ReLU FFN};
  final LayerNorm; lm_head; logits sliced to the last T positions.

Fidelity quirks preserved: softmax scale n_embd**-0.5 (not head_dim), the
first-6-columns-always-visible causal mask, per-head learnable rel_pos_emb of
length block_len+6, and per-head value concat -> out proj with bias.

Beyond the reference, this model adds a state-cached decode path
(`prefill` / `step`) so sampling is O(T) per token instead of the
reference's full-window re-forward (scripts/generate.py:29, the reference's
single biggest performance defect per SURVEY.md §6).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import TransformerConfig
from ..ops.attention import (
    relpos_attention,
    relpos_attention_step,
)

Cache = Dict[str, jax.Array]


class RelPosSelfAttention(nn.Module):
    cfg: TransformerConfig
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        self.head_dim = c.n_embd // c.n_heads
        dense = lambda name: nn.Dense(
            c.n_embd, use_bias=False, dtype=self.dtype, name=name
        )
        self.q_proj = dense("q")
        self.k_proj = dense("k")
        self.v_proj = dense("v")
        # Per-head learnable relative-position embedding, length = block+6
        # (reference model_transformer.py:60, init torch.randn -> N(0,1)).
        self.rel_pos_emb = self.param(
            "rel_pos_emb",
            nn.initializers.normal(stddev=1.0),
            (c.n_heads, c.seq_len, self.head_dim),
        )
        self.out_proj = nn.Dense(c.n_embd, dtype=self.dtype, name="proj")
        self.attn_drop = nn.Dropout(rate=c.dropout)
        self.resid_drop = nn.Dropout(rate=c.dropout)

    def _split(self, x: jax.Array) -> jax.Array:
        b, t, _ = x.shape
        return x.reshape(b, t, self.cfg.n_heads, self.head_dim).transpose(0, 2, 1, 3)

    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        c = self.cfg
        q, k, v = self._split(self.q_proj(x)), self._split(self.k_proj(x)), self._split(self.v_proj(x))
        scale = float(c.n_embd) ** -0.5  # reference uses model width, not head_dim
        impl = c.attention_impl
        if impl == "auto":
            impl = "flash" if jax.default_backend() != "cpu" else "xla"
        if impl == "flash":
            # Fused flash fwd + custom-VJP flash bwd (dQ/dK/dV/dRel): the
            # training hot path never materializes the (B,H,T,T) scores.
            from ..ops.pallas_attention import flash_relpos_attention_train

            out = flash_relpos_attention_train(
                q, k, v, self.rel_pos_emb.astype(self.dtype), scale
            )
        else:
            # attention_impl == "torch_exact" keeps torch _rel_shift's wrapped
            # above-diagonal BD values (visible only in the meta columns of
            # meta rows) — bit-parity mode for the cross-framework harness.
            out = relpos_attention(
                q, k, v, self.rel_pos_emb.astype(self.dtype), scale,
                torch_exact_bd=(c.attention_impl == "torch_exact"),
            )
        # NB: the reference applies dropout to attention probabilities
        # (model_transformer.py:80); we apply it to the attended values, which
        # is the fusable form with identical expectation.
        out = self.attn_drop(out, deterministic=deterministic)
        b, h, t, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, t, h * d)
        return self.resid_drop(self.out_proj(out), deterministic=deterministic)

    def prefill(self, x: jax.Array) -> Tuple[jax.Array, Cache]:
        c = self.cfg
        q, k, v = self._split(self.q_proj(x)), self._split(self.k_proj(x)), self._split(self.v_proj(x))
        scale = float(c.n_embd) ** -0.5
        impl = c.attention_impl
        if impl == "auto":
            impl = "flash" if jax.default_backend() != "cpu" else "xla"
        if impl == "flash":
            from ..ops.pallas_attention import flash_relpos_attention

            out = flash_relpos_attention(
                q, k, v, self.rel_pos_emb.astype(self.dtype), scale
            )
        else:
            out = relpos_attention(q, k, v, self.rel_pos_emb.astype(self.dtype), scale)
        b, h, t, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, t, h * d)
        return self.out_proj(out), {"k": k, "v": v}

    def step(
        self,
        x: jax.Array,
        cache: Cache,
        slot: jax.Array,
        key_ages: jax.Array,
        rel_base: jax.Array,
    ) -> Tuple[jax.Array, Cache]:
        """x: (B, n_embd) single position. Writes K/V at `slot`, attends with
        the provided per-slot ages.

        `slot` may be a (B,) vector (with key_ages (B, S)): each batch row
        writes its own ring slot — the continuous-batching serving case
        where rows sit at different stream offsets."""
        c = self.cfg
        b = x.shape[0]
        q = self.q_proj(x).reshape(b, c.n_heads, self.head_dim)
        k = self.k_proj(x).reshape(b, c.n_heads, self.head_dim)
        v = self.v_proj(x).reshape(b, c.n_heads, self.head_dim)
        if jnp.ndim(slot) == 1:
            upd = jax.vmap(
                lambda full, new, s: jax.lax.dynamic_update_index_in_dim(
                    full, new, s, 1
                )
            )
            k_cache = upd(cache["k"], k, slot)
            v_cache = upd(cache["v"], v, slot)
        else:
            k_cache = jax.lax.dynamic_update_index_in_dim(cache["k"], k, slot, 2)
            v_cache = jax.lax.dynamic_update_index_in_dim(cache["v"], v, slot, 2)
        scale = float(c.n_embd) ** -0.5
        out = relpos_attention_step(
            q, k_cache, v_cache, self.rel_pos_emb.astype(self.dtype), scale,
            key_ages, rel_base,
        )
        out = out.reshape(b, c.n_embd)
        return self.out_proj(out), {"k": k_cache, "v": v_cache}


class MLP(nn.Module):
    cfg: TransformerConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        c = self.cfg
        h = nn.Dense(4 * c.n_embd, dtype=self.dtype, name="fc")(x)
        h = nn.relu(h)
        h = nn.Dense(c.n_embd, dtype=self.dtype, name="out")(h)
        return nn.Dropout(rate=c.dropout)(h, deterministic=deterministic)


class Block(nn.Module):
    cfg: TransformerConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.ln1 = nn.LayerNorm(dtype=self.dtype)
        self.ln2 = nn.LayerNorm(dtype=self.dtype)
        self.attn = RelPosSelfAttention(self.cfg, dtype=self.dtype)
        self.mlp = MLP(self.cfg, dtype=self.dtype)

    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        x = x + self.attn(self.ln1(x), deterministic=deterministic)
        x = x + self.mlp(self.ln2(x), deterministic=deterministic)
        return x

    def prefill(self, x: jax.Array) -> Tuple[jax.Array, Cache]:
        a, cache = self.attn.prefill(self.ln1(x))
        x = x + a
        x = x + self.mlp(self.ln2(x), deterministic=True)
        return x, cache

    def step(
        self,
        x: jax.Array,
        cache: Cache,
        slot: jax.Array,
        key_ages: jax.Array,
        rel_base: jax.Array,
    ) -> Tuple[jax.Array, Cache]:
        a, cache = self.attn.step(self.ln1(x), cache, slot, key_ages, rel_base)
        x = x + a
        x = x + self.mlp(self.ln2(x), deterministic=True)
        return x, cache


class TransformerLM(nn.Module):
    """Composer-conditioned decoder-only LM (reference Transformer parity)."""

    cfg: TransformerConfig
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        self.token_embedding = nn.Embed(c.padded_vocab, c.n_embd, dtype=self.dtype)
        self.metadata_embedding = nn.Embed(
            c.metadata_vocab_size, c.n_embd, dtype=self.dtype
        )
        # remat: recompute each Block in the backward pass (jax.checkpoint);
        # deterministic is a static arg (self=0, x=1, deterministic=2).
        block = (
            nn.remat(Block, static_argnums=(2,))
            if getattr(c, "remat", False) else Block
        )
        self.blocks = [
            block(c, dtype=self.dtype, name=f"block_{i}") for i in range(c.n_layer)
        ]
        self.ln_f = nn.LayerNorm(dtype=self.dtype)
        self.lm_head = nn.Dense(c.padded_vocab, dtype=jnp.float32, name="lm_head")

    def __call__(
        self, tokens: jax.Array, meta: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        """tokens: (B, T) int32, meta: (B, 6) int32 -> logits (B, T, vocab)."""
        t = tokens.shape[1]
        x = self.hidden(tokens, meta, deterministic)
        logits = self.lm_head(x.astype(jnp.float32))[..., : self.cfg.vocab_size]
        return logits[:, -t:, :]  # drop meta positions (reference :164)

    def hidden(
        self, tokens: jax.Array, meta: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        """Final-LN hidden states (B, meta+T, n_embd) — the lm_head input."""
        x = self.token_embedding(tokens)
        m = self.metadata_embedding(meta)
        x = jnp.concatenate([m, x], axis=1)  # meta prefix (reference :155)
        for block in self.blocks:
            x = block(x, deterministic)  # positional: remat static_argnums
        return self.ln_f(x)

    def prefill(
        self, tokens: jax.Array, meta: jax.Array
    ) -> Tuple[jax.Array, Tuple[Cache, ...]]:
        """Full forward that also returns the per-layer KV cache.

        The prompt may be shorter than block_len; caches are padded to the
        full seq_len slot count (the caller tracks slot ages and masks
        unfilled slots). Returns (logits (B, T, vocab), caches).
        """
        t = tokens.shape[1]
        s = self.cfg.seq_len
        x = jnp.concatenate(
            [self.metadata_embedding(meta), self.token_embedding(tokens)], axis=1
        )
        caches = []
        for block in self.blocks:
            x, cache = block.prefill(x)
            pad = s - cache["k"].shape[2]
            if pad:
                cache = {
                    key: jnp.pad(val, ((0, 0), (0, 0), (0, pad), (0, 0)))
                    for key, val in cache.items()
                }
            caches.append(cache)
        x = self.ln_f(x)
        logits = self.lm_head(x.astype(jnp.float32))[..., : self.cfg.vocab_size]
        return logits[:, -t:, :], tuple(caches)

    def step(
        self,
        token: jax.Array,  # (B,) int32 newest token
        caches: Tuple[Cache, ...],
        slot: jax.Array,  # scalar int32 cache slot to write
        key_ages: jax.Array,  # (seq_len,) int32 per-slot ages
        rel_base: jax.Array,  # scalar int32 query row in the current window
    ) -> Tuple[jax.Array, Tuple[Cache, ...]]:
        """O(1)-per-token cached decode step. Returns (logits (B, vocab), caches)."""
        x = self.token_embedding(token)
        new_caches = []
        for block, cache in zip(self.blocks, caches):
            x, cache = block.step(x, cache, slot, key_ages, rel_base)
            new_caches.append(cache)
        x = self.ln_f(x)
        logits = self.lm_head(x.astype(jnp.float32))[..., : self.cfg.vocab_size]
        return logits, tuple(new_caches)
