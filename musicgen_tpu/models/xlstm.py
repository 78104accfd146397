"""xLSTM block stack — generator LM and composer classifier.

TPU-native counterpart of the reference's NX-AI `xLSTMBlockStack` usage
(reference: models/xlstm/xlstm_model.py:17-57 — 11 blocks, embedding 1024,
sLSTM at [1,4,7,10] with conv k=4, 4 heads, powerlaw_blockdependent fgate
bias, FFN proj 1.3 gelu; mLSTM elsewhere with conv k=4, qkv blocksize 4,
4 heads — and models/classifier/model.py:18-58, same stack at dim 512).

Block anatomy (xLSTM paper / NX-AI v1 structure):

  mLSTM block (pre-LN residual):
    x' = LN(x); up-proj to 2*pf*d (pf=2) -> [x_m, z]
    x_c = swish(causal_conv1d(x_m)); q,k = blockwise proj(x_c); v = x_m
    h = mlstm(q, k, v, igate, fgate) (gates from concat [q,k,v])
    h = multihead-norm(h) + learnable_skip * x_c
    y = down_proj(h * swish(z));  out = x + y

  sLSTM block (pre-LN residual + post FFN sub-block):
    x' = LN(x); x_c = swish(causal_conv1d(x'))
    i,f gates from x_c; z,o gates from x'; + block-diag recurrence on h
    h = groupnorm(slstm(...)); y = x + out_proj(h)
    out = y + ffn(LN(y))   (proj 1.3, gelu)

Decode: every block exposes prefill/step with O(1) recurrent state —
replacing the reference's per-token full re-forward (SURVEY.md §3.3).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import ClassifierConfig, XLSTMConfig
from ..ops.mlstm import mlstm_chunkwise, mlstm_parallel, mlstm_step
from ..ops.slstm import (
    powerlaw_blockdependent_bias,
    slstm_sequential,
    slstm_step,
)
from ..ops.ssm import causal_conv1d, causal_conv1d_step

BlockState = Dict[str, Any]


class BlockwiseDense(nn.Module):
    """Block-diagonal projection (NX-AI LinearHeadwiseExpand with
    qkv_proj_blocksize): features split into blocks of `block_size`, each
    mapped block_size -> block_size independently."""

    block_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = x.shape[-1]
        nb = d // self.block_size
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (nb, self.block_size, self.block_size),
        )
        xb = x.reshape(*x.shape[:-1], nb, self.block_size)
        yb = jnp.einsum("...ni,nij->...nj", xb.astype(self.dtype), w.astype(self.dtype))
        return yb.reshape(*x.shape)


class MLSTMLayer(nn.Module):
    """Inner mLSTM layer (operates on the up-projected width)."""

    d_model: int
    num_heads: int
    conv_kernel: int
    qkv_blocksize: int
    proj_factor: float = 2.0
    dtype: Any = jnp.float32

    def setup(self):
        self.d_inner = int(self.proj_factor * self.d_model)
        self.dh = self.d_inner // self.num_heads
        self.up_proj = nn.Dense(2 * self.d_inner, use_bias=False, dtype=self.dtype)
        self.conv_w = self.param(
            "conv_w", nn.initializers.lecun_normal(), (self.conv_kernel, self.d_inner)
        )
        self.conv_b = self.param("conv_b", nn.initializers.zeros, (self.d_inner,))
        self.q_proj = BlockwiseDense(self.qkv_blocksize, dtype=self.dtype, name="q")
        self.k_proj = BlockwiseDense(self.qkv_blocksize, dtype=self.dtype, name="k")
        self.v_proj = BlockwiseDense(self.qkv_blocksize, dtype=self.dtype, name="v")
        self.igate = nn.Dense(self.num_heads, dtype=jnp.float32, name="igate")
        self.fgate = nn.Dense(
            self.num_heads,
            dtype=jnp.float32,
            bias_init=nn.initializers.constant(3.0),
            name="fgate",
        )
        self.outnorm_scale = self.param(
            "outnorm_scale", nn.initializers.ones, (self.d_inner,)
        )
        self.learnable_skip = self.param(
            "learnable_skip", nn.initializers.ones, (self.d_inner,)
        )
        self.down_proj = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype)

    def _headnorm(self, h: jax.Array) -> jax.Array:
        """Per-head layernorm (no bias), then flatten heads."""
        mean = jnp.mean(h, axis=-1, keepdims=True)
        var = jnp.var(h, axis=-1, keepdims=True)
        hn = (h - mean) * jax.lax.rsqrt(var + 1e-5)
        flat = hn.reshape(*h.shape[:-2], self.d_inner)
        return flat * self.outnorm_scale

    def _gates_qkv(self, x_conv, v_in):
        b = x_conv.shape[0]
        q = self.q_proj(x_conv)
        k = self.k_proj(x_conv)
        v = self.v_proj(v_in)
        gate_in = jnp.concatenate([q, k, v], axis=-1)
        ig = self.igate(gate_in.astype(jnp.float32))
        fg = self.fgate(gate_in.astype(jnp.float32))
        return q, k, v, ig, fg

    def __call__(self, x: jax.Array) -> jax.Array:
        b, t, _ = x.shape
        up = self.up_proj(x)
        x_m, z = jnp.split(up, 2, axis=-1)
        x_c = jax.nn.silu(causal_conv1d(x_m, self.conv_w, self.conv_b))
        q, k, v, ig, fg = self._gates_qkv(x_c, x_m)
        qh = q.reshape(b, t, self.num_heads, self.dh)
        kh = k.reshape(b, t, self.num_heads, self.dh)
        vh = v.reshape(b, t, self.num_heads, self.dh)
        h = mlstm_parallel(qh, kh, vh, ig, fg)
        h = self._headnorm(h).astype(x.dtype)
        h = h + self.learnable_skip * x_c
        y = h * jax.nn.silu(z)
        return self.down_proj(y)

    def prefill(self, x: jax.Array) -> Tuple[jax.Array, BlockState]:
        b, t, _ = x.shape
        up = self.up_proj(x)
        x_m, z = jnp.split(up, 2, axis=-1)
        tail = x_m[:, -(self.conv_kernel - 1) :, :]
        pad_t = self.conv_kernel - 1 - tail.shape[1]
        if pad_t > 0:
            tail = jnp.pad(tail, ((0, 0), (pad_t, 0), (0, 0)))
        x_c = jax.nn.silu(causal_conv1d(x_m, self.conv_w, self.conv_b))
        q, k, v, ig, fg = self._gates_qkv(x_c, x_m)
        qh = q.reshape(b, t, self.num_heads, self.dh)
        kh = k.reshape(b, t, self.num_heads, self.dh)
        vh = v.reshape(b, t, self.num_heads, self.dh)

        # Chunkwise form: one pass yields BOTH the sequence outputs and the
        # exact (S, n, m) decode state in O(T*chunk) memory. Trailing pad
        # steps are made inert (i = -inf -> no write, f-pre large -> decay 1).
        chunk = min(256, max(16, t))
        pad = (-t) % chunk
        if pad:
            qh = jnp.pad(qh, ((0, 0), (0, pad), (0, 0), (0, 0)))
            kh = jnp.pad(kh, ((0, 0), (0, pad), (0, 0), (0, 0)))
            vh = jnp.pad(vh, ((0, 0), (0, pad), (0, 0), (0, 0)))
            ig_p = jnp.pad(ig, ((0, 0), (0, pad), (0, 0)), constant_values=-1e30)
            fg_p = jnp.pad(fg, ((0, 0), (0, pad), (0, 0)), constant_values=30.0)
        else:
            ig_p, fg_p = ig, fg
        h, mstate = mlstm_chunkwise(qh, kh, vh, ig_p, fg_p, chunk=chunk)
        h = h[:, :t]
        state = {"conv": tail, "mlstm": mstate}
        h = self._headnorm(h).astype(x.dtype)
        h = h + self.learnable_skip * x_c
        y = h * jax.nn.silu(z)
        return self.down_proj(y), state

    def step(self, x: jax.Array, state: BlockState) -> Tuple[jax.Array, BlockState]:
        b = x.shape[0]
        up = self.up_proj(x)
        x_m, z = jnp.split(up, 2, axis=-1)
        conv_out, conv_state = causal_conv1d_step(
            x_m, state["conv"], self.conv_w, self.conv_b
        )
        x_c = jax.nn.silu(conv_out)
        q, k, v, ig, fg = self._gates_qkv(x_c, x_m)
        qh = q.reshape(b, self.num_heads, self.dh)
        kh = k.reshape(b, self.num_heads, self.dh)
        vh = v.reshape(b, self.num_heads, self.dh)
        h, mstate = mlstm_step(qh, kh, vh, ig, fg, state["mlstm"])
        h = self._headnorm(h).astype(x.dtype)
        h = h + self.learnable_skip * x_c
        y = h * jax.nn.silu(z)
        return self.down_proj(y), {"conv": conv_state, "mlstm": mstate}


class SLSTMLayer(nn.Module):
    """Inner sLSTM layer with block-diagonal recurrence."""

    d_model: int
    num_heads: int
    conv_kernel: int
    block_idx: int = 0
    num_blocks: int = 1
    impl: str = "xla"  # 'pallas' = fused recurrence kernel in prefill
    dtype: Any = jnp.float32

    def setup(self):
        self.dh = self.d_model // self.num_heads
        self.conv_w = self.param(
            "conv_w", nn.initializers.lecun_normal(), (self.conv_kernel, self.d_model)
        )
        self.conv_b = self.param("conv_b", nn.initializers.zeros, (self.d_model,))
        # Input projections: i, f from the conv path; z, o from the raw path.
        self.w_i = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype, name="w_i")
        self.w_f = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype, name="w_f")
        self.w_z = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype, name="w_z")
        self.w_o = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype, name="w_o")
        # Block-diagonal recurrent weights (4, H, DH, DH), orthogonal-ish init.
        self.r_kernel = self.param(
            "r_kernel",
            nn.initializers.normal(stddev=1.0 / jnp.sqrt(self.dh)),
            (4, self.num_heads, self.dh, self.dh),
        )
        def bias_init(key, shape, dtype=jnp.float32):
            bias = jnp.zeros(shape, dtype)
            fbias = powerlaw_blockdependent_bias(
                self.num_heads, self.dh, self.block_idx, self.num_blocks
            )
            return bias.at[1].set(fbias)

        self.bias = self.param("bias", bias_init, (4, self.num_heads, self.dh))
        self.group_norm_scale = self.param(
            "gn_scale", nn.initializers.ones, (self.d_model,)
        )

    def _wx(self, x: jax.Array, x_conv: jax.Array) -> jax.Array:
        """(B, [T,] 4, H, DH) gate input preactivations in order i,f,z,o."""
        gates = [self.w_i(x_conv), self.w_f(x_conv), self.w_z(x), self.w_o(x)]
        stacked = jnp.stack(gates, axis=-2)  # (..., 4, D)
        return stacked.reshape(*stacked.shape[:-1], self.num_heads, self.dh)

    def _groupnorm(self, h: jax.Array) -> jax.Array:
        """Per-head groupnorm then flatten (GroupNorm(num_heads) equivalent)."""
        mean = jnp.mean(h, axis=-1, keepdims=True)
        var = jnp.var(h, axis=-1, keepdims=True)
        hn = (h - mean) * jax.lax.rsqrt(var + 1e-5)
        flat = hn.reshape(*h.shape[:-2], self.d_model)
        return flat * self.group_norm_scale

    def __call__(self, x: jax.Array) -> jax.Array:
        x_c = jax.nn.silu(causal_conv1d(x, self.conv_w, self.conv_b))
        wx = self._wx(x, x_c)
        h, _ = slstm_sequential(wx, self.r_kernel, self.bias)
        return self._groupnorm(h).astype(x.dtype)

    def prefill(self, x: jax.Array) -> Tuple[jax.Array, BlockState]:
        tail = x[:, -(self.conv_kernel - 1) :, :]
        pad_t = self.conv_kernel - 1 - tail.shape[1]
        if pad_t > 0:
            tail = jnp.pad(tail, ((0, 0), (pad_t, 0), (0, 0)))
        x_c = jax.nn.silu(causal_conv1d(x, self.conv_w, self.conv_b))
        wx = self._wx(x, x_c)
        from ..ops.dispatch import resolve_impl

        if resolve_impl(self.impl) == "pallas":
            from ..ops.pallas_slstm import slstm_pallas

            h, sstate = slstm_pallas(wx, self.r_kernel, self.bias, chunk=128)
        else:
            h, sstate = slstm_sequential(wx, self.r_kernel, self.bias)
        return self._groupnorm(h).astype(x.dtype), {"conv": tail, "slstm": sstate}

    def step(self, x: jax.Array, state: BlockState) -> Tuple[jax.Array, BlockState]:
        conv_out, conv_state = causal_conv1d_step(
            x, state["conv"], self.conv_w, self.conv_b
        )
        x_c = jax.nn.silu(conv_out)
        wx = self._wx(x, x_c)
        h, sstate = slstm_step(wx, self.r_kernel, self.bias, state["slstm"])
        return self._groupnorm(h).astype(x.dtype), {"conv": conv_state, "slstm": sstate}


class FFN(nn.Module):
    d_model: int
    proj_factor: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        inner = int(self.proj_factor * self.d_model)
        h = nn.Dense(inner, dtype=self.dtype, name="up")(x)
        h = nn.gelu(h)
        return nn.Dense(self.d_model, dtype=self.dtype, name="down")(h)


class XLSTMBlock(nn.Module):
    """One stack block: pre-LN residual mLSTM or sLSTM(+FFN)."""

    d_model: int
    num_heads: int
    conv_kernel: int
    qkv_blocksize: int
    is_slstm: bool
    block_idx: int
    num_blocks: int
    mlstm_proj_factor: float = 2.0
    slstm_ff_proj_factor: float = 1.3
    slstm_impl: str = "xla"
    dtype: Any = jnp.float32

    def setup(self):
        self.ln = nn.LayerNorm(dtype=self.dtype)
        if self.is_slstm:
            self.layer = SLSTMLayer(
                self.d_model, self.num_heads, self.conv_kernel,
                block_idx=self.block_idx, num_blocks=self.num_blocks,
                impl=self.slstm_impl, dtype=self.dtype, name="slstm",
            )
            self.ln_ffn = nn.LayerNorm(dtype=self.dtype)
            self.ffn = FFN(self.d_model, self.slstm_ff_proj_factor, dtype=self.dtype)
        else:
            self.layer = MLSTMLayer(
                self.d_model, self.num_heads, self.conv_kernel,
                self.qkv_blocksize, proj_factor=self.mlstm_proj_factor,
                dtype=self.dtype, name="mlstm",
            )

    def __call__(self, x: jax.Array) -> jax.Array:
        x = x + self.layer(self.ln(x))
        if self.is_slstm:
            x = x + self.ffn(self.ln_ffn(x))
        return x

    def prefill(self, x: jax.Array) -> Tuple[jax.Array, BlockState]:
        y, state = self.layer.prefill(self.ln(x))
        x = x + y
        if self.is_slstm:
            x = x + self.ffn(self.ln_ffn(x))
        return x, state

    def step(self, x: jax.Array, state: BlockState) -> Tuple[jax.Array, BlockState]:
        y, state = self.layer.step(self.ln(x), state)
        x = x + y
        if self.is_slstm:
            x = x + self.ffn(self.ln_ffn(x))
        return x, state


class XLSTMStack(nn.Module):
    d_model: int
    num_blocks: int
    slstm_at: Tuple[int, ...]
    num_heads: int
    conv_kernel: int
    qkv_blocksize: int
    mlstm_proj_factor: float = 2.0
    slstm_ff_proj_factor: float = 1.3
    slstm_impl: str = "xla"
    remat: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        # remat: recompute each block in the backward pass (jax.checkpoint).
        block_cls = (
            nn.remat(XLSTMBlock) if self.remat else XLSTMBlock
        )
        self.blocks = [
            block_cls(
                self.d_model, self.num_heads, self.conv_kernel, self.qkv_blocksize,
                is_slstm=(i in self.slstm_at), block_idx=i,
                num_blocks=self.num_blocks,
                mlstm_proj_factor=self.mlstm_proj_factor,
                slstm_ff_proj_factor=self.slstm_ff_proj_factor,
                slstm_impl=self.slstm_impl,
                dtype=self.dtype, name=f"block_{i}",
            )
            for i in range(self.num_blocks)
        ]
        self.post_norm = nn.LayerNorm(dtype=self.dtype)

    def __call__(self, x: jax.Array) -> jax.Array:
        for block in self.blocks:
            x = block(x)
        return self.post_norm(x)

    def prefill(self, x: jax.Array):
        states = []
        for block in self.blocks:
            x, st = block.prefill(x)
            states.append(st)
        return self.post_norm(x), tuple(states)

    def step(self, x: jax.Array, states):
        new_states = []
        for block, st in zip(self.blocks, states):
            x, st = block.step(x, st)
            new_states.append(st)
        return self.post_norm(x), tuple(new_states)


class XLSTMLM(nn.Module):
    """Composer-conditioned xLSTM generator (reference xlstm_model.py parity)."""

    cfg: XLSTMConfig
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        self.token_embedding = nn.Embed(c.padded_vocab, c.embedding_dim, dtype=self.dtype)
        self.metadata_embedding = nn.Embed(
            c.metadata_vocab_size, c.embedding_dim, dtype=self.dtype
        )
        self.stack = XLSTMStack(
            c.embedding_dim, c.num_blocks, c.slstm_at, c.num_heads,
            c.conv1d_kernel_size, c.qkv_proj_blocksize,
            c.mlstm_proj_factor, c.slstm_ff_proj_factor,
            slstm_impl=getattr(c, "slstm_impl", "xla"),
            remat=getattr(c, "remat", False), dtype=self.dtype,
        )
        self.lm_head = nn.Dense(c.padded_vocab, dtype=jnp.float32, name="lm_head")

    def __call__(self, tokens: jax.Array, meta: jax.Array, deterministic: bool = True):
        x = self.hidden(tokens, meta)
        logits = self.lm_head(x.astype(jnp.float32))[..., : self.cfg.vocab_size]
        return logits[:, meta.shape[1] :]

    def hidden(
        self, tokens: jax.Array, meta: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        """Post-norm hidden states (B, meta+T, dim) — the lm_head input."""
        x = jnp.concatenate(
            [self.metadata_embedding(meta), self.token_embedding(tokens)], axis=1
        )
        return self.stack(x)

    def prefill(self, tokens: jax.Array, meta: jax.Array):
        x = jnp.concatenate(
            [self.metadata_embedding(meta), self.token_embedding(tokens)], axis=1
        )
        x, states = self.stack.prefill(x)
        logits = self.lm_head(x.astype(jnp.float32))[..., : self.cfg.vocab_size]
        return logits[:, meta.shape[1] :], states

    def step(self, token: jax.Array, states):
        x = self.token_embedding(token)
        x, states = self.stack.step(x, states)
        logits = self.lm_head(x.astype(jnp.float32))[..., : self.cfg.vocab_size]
        return logits, states


class XLSTMClassifier(nn.Module):
    """Composer classifier: xLSTM stack at dim 512, last hidden -> meta
    logits (reference models/classifier/model.py:44-58; the reference's
    unused `output_layer` Linear is intentionally omitted)."""

    cfg: ClassifierConfig
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        self.token_embedding = nn.Embed(c.padded_vocab, c.embedding_dim, dtype=self.dtype)
        self.stack = XLSTMStack(
            c.embedding_dim, c.num_blocks, c.slstm_at, c.num_heads,
            c.conv1d_kernel_size, c.qkv_proj_blocksize,
            c.mlstm_proj_factor, c.slstm_ff_proj_factor, dtype=self.dtype,
        )
        self.fc = nn.Dense(c.metadata_vocab_size, dtype=jnp.float32)

    def __call__(self, tokens: jax.Array, deterministic: bool = True):
        x = self.token_embedding(tokens)
        x = self.stack(x)
        return self.fc(x[:, -1, :].astype(jnp.float32))
