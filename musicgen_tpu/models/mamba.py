"""Mamba-2 generator — TPU-native replacement for the reference's
`mamba_ssm.Mamba2` stack (reference: models/mamba/mamba.py:8-35).

Architecture parity (verified by exact parameter count 101,972,666 at the
reference hyperparameters, matching scripts/Test Accuracy.ipynb cell 1):

  token embed (17914 x 1024) + metadata embed (568 x 1024), meta PREPENDED;
  10 x Mamba2 mixer blocks (d_model 1024, d_state 64, d_conv 4, expand 2,
  headdim 64 -> 32 heads) stacked WITHOUT inter-layer residuals or norms —
  a reference quirk (models/mamba/mamba.py:32-33) reproduced deliberately;
  final LayerNorm; lm_head; logits sliced [:, 6:].

Each mixer: in_proj -> [z, x, B, C, dt]; depthwise causal conv over
(x, B, C) + silu; dt = softplus(dt + dt_bias); SSD selective scan
(ops/ssm.ssd_chunked, replacing the CUDA/Triton kernels of
state-spaces/mamba + Dao-AILab/causal-conv1d); y + D*x; gated RMSNorm
(y * silu(z)); out_proj.

Decode: O(1) per-token state = (conv window (K-1), SSM state (H,P,N)) per
layer via `prefill`/`step` — the reference has no state caching at sampling
time (SURVEY.md §3.3) and pays an O(T) re-forward per token.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import MambaConfig
from ..ops.ssm import (
    causal_conv1d,
    causal_conv1d_step,
    ssd_chunked,
    ssd_step,
)

LayerState = Dict[str, jax.Array]


def _rms_norm_gated(y: jax.Array, z: jax.Array, weight: jax.Array, eps: float = 1e-5):
    """RMSNorm(y * silu(z)) * weight — Mamba-2's gated output norm."""
    y = y * jax.nn.silu(z)
    var = jnp.mean(jnp.square(y.astype(jnp.float32)), axis=-1, keepdims=True)
    return (y.astype(jnp.float32) * jax.lax.rsqrt(var + eps)).astype(y.dtype) * weight


class Mamba2Mixer(nn.Module):
    cfg: MambaConfig
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        d_in_proj = 2 * c.d_inner + 2 * c.ngroups * c.d_state + c.nheads
        self.in_proj = nn.Dense(d_in_proj, use_bias=False, dtype=self.dtype)
        self.conv_w = self.param(
            "conv_w",
            nn.initializers.lecun_normal(),
            (c.d_conv, c.conv_dim),
        )
        self.conv_b = self.param("conv_b", nn.initializers.zeros, (c.conv_dim,))
        # dt bias from the standard Mamba dt init (softplus^-1 of U[1e-3, 1e-1])
        def dt_bias_init(key, shape, dtype=jnp.float32):
            dt = jnp.exp(
                jax.random.uniform(key, shape, dtype)
                * (jnp.log(0.1) - jnp.log(0.001))
                + jnp.log(0.001)
            )
            dt = jnp.clip(dt, min=1e-4)
            return dt + jnp.log(-jnp.expm1(-dt))

        self.dt_bias = self.param("dt_bias", dt_bias_init, (c.nheads,))
        # A in [1, 16] uniform -> A_log (standard Mamba-2 init)
        def a_log_init(key, shape, dtype=jnp.float32):
            return jnp.log(jax.random.uniform(key, shape, dtype, 1.0, 16.0))

        self.A_log = self.param("A_log", a_log_init, (c.nheads,))
        self.D = self.param("D", nn.initializers.ones, (c.nheads,))
        self.norm_weight = self.param("norm_weight", nn.initializers.ones, (c.d_inner,))
        self.out_proj = nn.Dense(c.d_model, use_bias=False, dtype=self.dtype)

    def _split_in_proj(self, zxbcdt: jax.Array):
        c = self.cfg
        return jnp.split(
            zxbcdt,
            [
                c.d_inner,
                2 * c.d_inner,
                2 * c.d_inner + c.ngroups * c.d_state,
                2 * c.d_inner + 2 * c.ngroups * c.d_state,
            ],
            axis=-1,
        )

    def __call__(self, u: jax.Array) -> jax.Array:
        """u: (B, T, d_model) -> (B, T, d_model). T padded to chunk multiple
        internally."""
        c = self.cfg
        b, t, _ = u.shape
        z, x, Bm, Cm, dt = self._split_in_proj(self.in_proj(u))

        xbc = jnp.concatenate([x, Bm, Cm], axis=-1)
        xbc = jax.nn.silu(causal_conv1d(xbc, self.conv_w, self.conv_b))
        x, Bm, Cm = jnp.split(
            xbc, [c.d_inner, c.d_inner + c.ngroups * c.d_state], axis=-1
        )

        dt = jax.nn.softplus(dt.astype(jnp.float32) + self.dt_bias)
        A = -jnp.exp(self.A_log)

        # Pad T to a chunk multiple for the chunked scan.
        chunk = min(c.chunk_size, max(16, t))
        pad = (-t) % chunk
        if pad:
            x_p = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
            dt_p = jnp.pad(dt, ((0, 0), (0, pad), (0, 0)))
            B_p = jnp.pad(Bm, ((0, 0), (0, pad), (0, 0)))
            C_p = jnp.pad(Cm, ((0, 0), (0, pad), (0, 0)))
        else:
            x_p, dt_p, B_p, C_p = x, dt, Bm, Cm

        xh = x_p.reshape(b, t + pad, c.nheads, c.headdim)
        dth = dt_p.reshape(b, t + pad, c.nheads)
        Bh = B_p.reshape(b, t + pad, c.ngroups, c.d_state)
        Ch = C_p.reshape(b, t + pad, c.ngroups, c.d_state)

        y, _ = ssd_chunked(xh, dth, A, Bh, Ch, chunk=chunk)
        y = y[:, :t]
        y = y + x.reshape(b, t, c.nheads, c.headdim) * self.D[None, None, :, None]
        y = y.reshape(b, t, c.d_inner).astype(u.dtype)

        y = _rms_norm_gated(y, z, self.norm_weight)
        return self.out_proj(y)

    def prefill(self, u: jax.Array) -> Tuple[jax.Array, LayerState]:
        """Like __call__ but also returns decode state (conv tail + SSM state)."""
        c = self.cfg
        b, t, _ = u.shape
        z, x, Bm, Cm, dt = self._split_in_proj(self.in_proj(u))

        xbc_raw = jnp.concatenate([x, Bm, Cm], axis=-1)
        # Conv tail: the last K-1 raw inputs feed future steps.
        tail = xbc_raw[:, -(c.d_conv - 1) :, :]
        pad_t = c.d_conv - 1 - tail.shape[1]
        if pad_t > 0:
            tail = jnp.pad(tail, ((0, 0), (pad_t, 0), (0, 0)))

        xbc = jax.nn.silu(causal_conv1d(xbc_raw, self.conv_w, self.conv_b))
        x, Bm, Cm = jnp.split(
            xbc, [c.d_inner, c.d_inner + c.ngroups * c.d_state], axis=-1
        )
        dt = jax.nn.softplus(dt.astype(jnp.float32) + self.dt_bias)
        A = -jnp.exp(self.A_log)

        chunk = min(c.chunk_size, max(16, t))
        pad = (-t) % chunk
        x_p = jnp.pad(x, ((0, 0), (0, pad), (0, 0))) if pad else x
        dt_p = jnp.pad(dt, ((0, 0), (0, pad), (0, 0))) if pad else dt
        B_p = jnp.pad(Bm, ((0, 0), (0, pad), (0, 0))) if pad else Bm
        C_p = jnp.pad(Cm, ((0, 0), (0, pad), (0, 0))) if pad else Cm

        xh = x_p.reshape(b, t + pad, c.nheads, c.headdim)
        dth = dt_p.reshape(b, t + pad, c.nheads)
        Bh = B_p.reshape(b, t + pad, c.ngroups, c.d_state)
        Ch = C_p.reshape(b, t + pad, c.ngroups, c.d_state)

        from ..ops.dispatch import resolve_impl

        if resolve_impl(c.ssd_impl) == "pallas":
            from ..ops.pallas_ssd import ssd_chunked_pallas

            y, ssm_state = ssd_chunked_pallas(xh, dth, A, Bh, Ch, chunk=chunk)
        else:
            y, ssm_state = ssd_chunked(xh, dth, A, Bh, Ch, chunk=chunk)
        # NB: trailing pad steps have dt=0 -> decay=1, no state update, so
        # ssm_state is exact despite padding.
        y = y[:, :t]
        y = y + x.reshape(b, t, c.nheads, c.headdim) * self.D[None, None, :, None]
        y = y.reshape(b, t, c.d_inner).astype(u.dtype)
        y = _rms_norm_gated(y, z, self.norm_weight)
        return self.out_proj(y), {"conv": tail, "ssm": ssm_state}

    def step(self, u: jax.Array, state: LayerState) -> Tuple[jax.Array, LayerState]:
        """u: (B, d_model) -> (B, d_model), O(1) state update."""
        c = self.cfg
        b = u.shape[0]
        z, x, Bm, Cm, dt = self._split_in_proj(self.in_proj(u))

        xbc = jnp.concatenate([x, Bm, Cm], axis=-1)
        conv_out, conv_state = causal_conv1d_step(
            xbc, state["conv"], self.conv_w, self.conv_b
        )
        xbc = jax.nn.silu(conv_out)
        x, Bm, Cm = jnp.split(
            xbc, [c.d_inner, c.d_inner + c.ngroups * c.d_state], axis=-1
        )
        dt = jax.nn.softplus(dt.astype(jnp.float32) + self.dt_bias)
        A = -jnp.exp(self.A_log)

        xh = x.reshape(b, c.nheads, c.headdim)
        Bh = Bm.reshape(b, c.ngroups, c.d_state)
        Ch = Cm.reshape(b, c.ngroups, c.d_state)
        y, ssm_state = ssd_step(xh, dt, A, Bh, Ch, state["ssm"])
        y = y + xh.astype(jnp.float32) * self.D[None, :, None]
        y = y.reshape(b, c.d_inner).astype(u.dtype)
        y = _rms_norm_gated(y, z, self.norm_weight)
        return self.out_proj(y), {"conv": conv_state, "ssm": ssm_state}


class MambaLM(nn.Module):
    """Composer-conditioned Mamba-2 LM (reference models/mamba/mamba.py parity)."""

    cfg: MambaConfig
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        self.token_embedding = nn.Embed(c.padded_vocab, c.d_model, dtype=self.dtype)
        self.metadata_embedding = nn.Embed(
            c.metadata_vocab_size, c.d_model, dtype=self.dtype
        )
        # remat: recompute each mixer's internals in the backward pass —
        # O(n_layers) less activation HBM for ~1 extra forward of FLOPs
        # (jax.checkpoint; complements --sp which shards the time axis).
        mixer = (
            nn.remat(Mamba2Mixer)
            if getattr(c, "remat", False) else Mamba2Mixer
        )
        self.layers = [
            mixer(c, dtype=self.dtype, name=f"layer_{i}")
            for i in range(c.n_layers)
        ]
        self.norm = nn.LayerNorm(dtype=self.dtype)
        self.lm_head = nn.Dense(c.padded_vocab, dtype=jnp.float32, name="lm_head")

    def __call__(self, tokens: jax.Array, meta: jax.Array, deterministic: bool = True):
        x = self.hidden(tokens, meta)
        logits = self.lm_head(x.astype(jnp.float32))[..., : self.cfg.vocab_size]
        return logits[:, meta.shape[1] :]

    def hidden(
        self, tokens: jax.Array, meta: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        """Final-norm hidden states (B, meta+T, d_model) — the lm_head input
        (train.loss.chunked_filtered_cross_entropy recomputes the head per
        time chunk from these instead of materializing (B, T, V) logits)."""
        x = jnp.concatenate(
            [self.metadata_embedding(meta), self.token_embedding(tokens)], axis=1
        )
        for layer in self.layers:
            # Reference quirk: NO residual between layers (mamba.py:32-33).
            x = layer(x) if not self.cfg.residual else x + layer(x)
        return self.norm(x)

    def prefill(self, tokens: jax.Array, meta: jax.Array):
        x = jnp.concatenate(
            [self.metadata_embedding(meta), self.token_embedding(tokens)], axis=1
        )
        states = []
        for layer in self.layers:
            y, st = layer.prefill(x)
            x = y if not self.cfg.residual else x + y
            states.append(st)
        x = self.norm(x)
        logits = self.lm_head(x.astype(jnp.float32))[..., : self.cfg.vocab_size]
        return logits[:, meta.shape[1] :], tuple(states)

    def step(self, token: jax.Array, states: Tuple[LayerState, ...]):
        """token: (B,) -> (logits (B, vocab), states)."""
        x = self.token_embedding(token)
        new_states = []
        for layer, st in zip(self.layers, states):
            y, st = layer.step(x, st)
            x = y if not self.cfg.residual else x + y
            new_states.append(st)
        x = self.norm(x)
        logits = self.lm_head(x.astype(jnp.float32))[..., : self.cfg.vocab_size]
        return logits, tuple(new_states)
