"""Guided-diffusion UNet in flax — bf16-friendly.

TPU-native counterpart of the reference UNet (reference: diffusion/unet.py:
ResBlock w/ FiLM scale-shift norm :159-274, AttentionBlock :277-399,
Up/Downsample :96-156, UNetModel :402-678, SuperResModel :681-696,
EncoderUNetModel :699-912; timestep_embedding diffusion/nn.py:119-137;
GroupNorm32 nn.py:xx — norms run fp32 inside a bf16 net).

The reference's fp16 master-param machinery (diffusion/fp16_util.py:50-241)
is replaced by bf16 compute (`dtype=jnp.bfloat16`) with fp32 params and
norms — no loss scaling needed on TPU.

Layout: public API is NCHW like the reference; convs run NHWC internally
(XLA-TPU's native conv layout).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def timestep_embedding(t: jax.Array, dim: int, max_period: float = 10000.0) -> jax.Array:
    """Sinusoidal timestep embeddings (reference nn.py:119-137)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def _group_norm(x: jax.Array, scale, bias, groups: int = 32) -> jax.Array:
    """GroupNorm in fp32 regardless of compute dtype (GroupNorm32)."""
    orig = x.dtype
    x = x.astype(jnp.float32)
    b, h, w, c = x.shape
    g = min(groups, c)
    xg = x.reshape(b, h, w, g, c // g)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xg, axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + 1e-5)
    x = xg.reshape(b, h, w, c) * scale + bias
    return x.astype(orig)


class GroupNorm32(nn.Module):
    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return _group_norm(x, scale, bias)


def zero_init_conv(features, kernel, dtype, name):
    """zero_module equivalent (reference nn.py): final convs init to 0."""
    return nn.Conv(
        features, kernel, padding="SAME", dtype=dtype,
        kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
        name=name,
    )


class ResBlock(nn.Module):
    out_channels: int
    dropout: float
    use_scale_shift_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, emb, deterministic: bool = True):
        in_ch = x.shape[-1]
        h = GroupNorm32(name="norm_in")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv_in")(h)

        emb_out = nn.Dense(
            2 * self.out_channels if self.use_scale_shift_norm else self.out_channels,
            dtype=self.dtype, name="emb",
        )(nn.silu(emb))
        emb_out = emb_out[:, None, None, :]

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = GroupNorm32(name="norm_out")(h) * (1 + scale) + shift
            h = nn.silu(h)
        else:
            h = h + emb_out
            h = nn.silu(GroupNorm32(name="norm_out")(h))
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = zero_init_conv(self.out_channels, (3, 3), self.dtype, "conv_out")(h)

        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="skip")(x)
        return x + h


class AttentionBlock(nn.Module):
    num_heads: int = 1
    num_head_channels: int = -1  # if set, heads = channels // head_channels
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        heads = (
            c // self.num_head_channels
            if self.num_head_channels != -1
            else self.num_heads
        )
        dh = c // heads
        xn = GroupNorm32(name="norm")(x)
        qkv = nn.Conv(3 * c, (1, 1), dtype=self.dtype, name="qkv")(xn)
        qkv = qkv.reshape(b, h * w, 3, heads, dh)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scale = dh ** -0.5
        attn = jnp.einsum("bthd,bshd->bhts", q, k) * scale
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(b, h, w, c)
        out = zero_init_conv(c, (1, 1), self.dtype, "proj")(out)
        return x + out


class AttentionPool2d(nn.Module):
    """CLIP-style attention pooling (reference unet.py:37-66): prepend the
    spatial mean as a query token, add a learned positional embedding, one
    multi-head attention round, project, return the pooled (first) token."""

    num_head_channels: int
    output_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # x: (B, H, W, C)
        b, h, w, c = x.shape
        seq = x.reshape(b, h * w, c)
        seq = jnp.concatenate([seq.mean(axis=1, keepdims=True), seq], axis=1)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=1.0 / c ** 0.5),
            (h * w + 1, c),
        )
        seq = seq + pos[None].astype(seq.dtype)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv_proj")(seq)
        heads = c // self.num_head_channels
        dh = c // heads
        qkv = qkv.reshape(b, h * w + 1, 3, heads, dh)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bthd,bshd->bhts", q, k) * dh ** -0.5
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(b, h * w + 1, c)
        out = nn.Dense(self.output_dim, dtype=self.dtype, name="c_proj")(out)
        return out[:, 0]


class Downsample(nn.Module):
    use_conv: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        if self.use_conv:
            return nn.Conv(c, (3, 3), strides=(2, 2), padding="SAME",
                           dtype=self.dtype, name="op")(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class Upsample(nn.Module):
    use_conv: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, 2 * h, 2 * w, c), "nearest")
        if self.use_conv:
            x = nn.Conv(c, (3, 3), padding="SAME", dtype=self.dtype, name="conv")(x)
        return x


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4  # piano-roll canvas planes
    model_channels: int = 128
    out_channels: int = 8  # 2x in_channels for LEARNED_RANGE
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (8, 16)  # downsample factors
    dropout: float = 0.0
    channel_mult: Tuple[int, ...] = (1, 2, 3, 4)
    num_heads: int = 4
    # heads = channels // num_head_channels when != -1 (reference unet.py:721)
    num_head_channels: int = -1
    # learned up/downsampling convs vs pooling/nearest (reference :717)
    conv_resample: bool = True
    # rematerialize ResBlocks in the backward pass (the TPU-native form of
    # reference nn.py:140-186 CheckpointFunction): trade FLOPs for HBM
    use_checkpoint: bool = False


class UNetModel(nn.Module):
    """Encoder-middle-decoder with skip concats (reference unet.py:402-678)."""

    cfg: UNetConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, t, deterministic: bool = True):
        """x: (B, C, H, W) NCHW like the reference; t: (B,) int timesteps."""
        c = self.cfg
        x = x.astype(self.dtype).transpose(0, 2, 3, 1)  # -> NHWC

        emb = timestep_embedding(t, c.model_channels)
        emb = nn.Dense(4 * c.model_channels, dtype=self.dtype, name="time1")(emb)
        emb = nn.Dense(4 * c.model_channels, dtype=self.dtype, name="time2")(nn.silu(emb))

        res_block = ResBlock
        if c.use_checkpoint:
            # flax remat: recompute ResBlock activations in the backward pass
            # (reference nn.py:140-186 CheckpointFunction, the TPU-native way)
            res_block = nn.remat(ResBlock, static_argnums=(2,))

        hs = []
        h = nn.Conv(c.model_channels, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv_in")(x)
        hs.append(h)
        ds = 1
        # Encoder
        for level, mult in enumerate(c.channel_mult):
            for i in range(c.num_res_blocks):
                h = res_block(mult * c.model_channels, c.dropout, dtype=self.dtype,
                              name=f"down_{level}_{i}")(h, emb, deterministic)
                if ds in c.attention_resolutions:
                    h = AttentionBlock(c.num_heads, c.num_head_channels,
                                       dtype=self.dtype,
                                       name=f"down_attn_{level}_{i}")(h)
                hs.append(h)
            if level != len(c.channel_mult) - 1:
                h = Downsample(c.conv_resample, dtype=self.dtype,
                               name=f"down_{level}_ds")(h)
                hs.append(h)
                ds *= 2
        # Middle
        h = res_block(h.shape[-1], c.dropout, dtype=self.dtype, name="mid_1")(h, emb, deterministic)
        h = AttentionBlock(c.num_heads, c.num_head_channels, dtype=self.dtype,
                           name="mid_attn")(h)
        h = res_block(h.shape[-1], c.dropout, dtype=self.dtype, name="mid_2")(h, emb, deterministic)
        # Decoder
        for level, mult in reversed(list(enumerate(c.channel_mult))):
            for i in range(c.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = res_block(mult * c.model_channels, c.dropout, dtype=self.dtype,
                              name=f"up_{level}_{i}")(h, emb, deterministic)
                if ds in c.attention_resolutions:
                    h = AttentionBlock(c.num_heads, c.num_head_channels,
                                       dtype=self.dtype,
                                       name=f"up_attn_{level}_{i}")(h)
            if level != 0:
                h = Upsample(c.conv_resample, dtype=self.dtype,
                             name=f"up_{level}_us")(h)
                ds //= 2

        h = nn.silu(GroupNorm32(name="norm_out")(h))
        h = zero_init_conv(c.out_channels, (3, 3), self.dtype, "conv_out")(h)
        return h.transpose(0, 3, 1, 2)  # -> NCHW


class SuperResModel(nn.Module):
    """Low-res conditioned UNet (reference unet.py:681-696): upsampled
    low-res input is concatenated on the channel axis."""

    cfg: UNetConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, t, low_res, deterministic: bool = True):
        b, c, h, w = x.shape
        up = jax.image.resize(low_res, (b, low_res.shape[1], h, w), "bilinear")
        inner_cfg = dataclasses.replace(
            self.cfg, in_channels=self.cfg.in_channels + low_res.shape[1]
        )
        return UNetModel(inner_cfg, dtype=self.dtype, name="unet")(
            jnp.concatenate([x, up], axis=1), t, deterministic
        )


class EncoderUNetModel(nn.Module):
    """Encoder-half classifier trunk with pooling (reference unet.py:699-912).

    pool variants (reference :841-871):
      'adaptive'   — norm, silu, global avg pool, zero-init projection
      'attention'  — norm, silu, AttentionPool2d (requires num_head_channels)
      'spatial'    — concat per-stage spatial means -> Linear 2048 -> ReLU
      'spatial_v2' — same but with GroupNorm + SiLU between the Linears
    """

    cfg: UNetConfig
    num_classes: int = 1000
    pool: str = "adaptive"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, t, deterministic: bool = True):
        c = self.cfg
        x = x.astype(self.dtype).transpose(0, 2, 3, 1)
        emb = timestep_embedding(t, c.model_channels)
        emb = nn.Dense(4 * c.model_channels, dtype=self.dtype, name="time1")(emb)
        emb = nn.Dense(4 * c.model_channels, dtype=self.dtype, name="time2")(nn.silu(emb))

        spatial = []
        h = nn.Conv(c.model_channels, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv_in")(x)
        if self.pool.startswith("spatial"):
            spatial.append(jnp.mean(h.astype(jnp.float32), axis=(1, 2)))
        ds = 1
        for level, mult in enumerate(c.channel_mult):
            for i in range(c.num_res_blocks):
                h = ResBlock(mult * c.model_channels, c.dropout, dtype=self.dtype,
                             name=f"down_{level}_{i}")(h, emb, deterministic)
                if ds in c.attention_resolutions:
                    h = AttentionBlock(c.num_heads, c.num_head_channels,
                                       dtype=self.dtype,
                                       name=f"down_attn_{level}_{i}")(h)
                if self.pool.startswith("spatial"):
                    spatial.append(jnp.mean(h.astype(jnp.float32), axis=(1, 2)))
            if level != len(c.channel_mult) - 1:
                h = Downsample(c.conv_resample, dtype=self.dtype,
                               name=f"down_{level}_ds")(h)
                if self.pool.startswith("spatial"):
                    spatial.append(jnp.mean(h.astype(jnp.float32), axis=(1, 2)))
                ds *= 2
        h = ResBlock(h.shape[-1], c.dropout, dtype=self.dtype, name="mid_1")(h, emb, deterministic)
        h = AttentionBlock(c.num_heads, c.num_head_channels, dtype=self.dtype,
                           name="mid_attn")(h)
        h = ResBlock(h.shape[-1], c.dropout, dtype=self.dtype, name="mid_2")(h, emb, deterministic)

        if self.pool == "adaptive":
            h = nn.silu(GroupNorm32(name="norm_out")(h))
            pooled = jnp.mean(h, axis=(1, 2))
            return nn.Dense(
                self.num_classes, dtype=jnp.float32,
                kernel_init=nn.initializers.zeros, name="out",
            )(pooled)
        if self.pool == "attention":
            assert c.num_head_channels != -1, "attention pool needs num_head_channels"
            h = nn.silu(GroupNorm32(name="norm_out")(h))
            return AttentionPool2d(
                c.num_head_channels, self.num_classes, dtype=self.dtype,
                name="attn_pool",
            )(h).astype(jnp.float32)
        if self.pool in ("spatial", "spatial_v2"):
            spatial.append(jnp.mean(h.astype(jnp.float32), axis=(1, 2)))
            feats = jnp.concatenate(spatial, axis=-1)
            z = nn.Dense(2048, dtype=jnp.float32, name="out1")(feats)
            if self.pool == "spatial_v2":
                z = _group_norm(z[:, None, None, :],
                                self.param("out_norm_scale", nn.initializers.ones, (2048,)),
                                self.param("out_norm_bias", nn.initializers.zeros, (2048,)),
                                )[:, 0, 0, :]
                z = nn.silu(z)
            else:
                z = nn.relu(z)
            return nn.Dense(self.num_classes, dtype=jnp.float32, name="out2")(z)
        raise NotImplementedError(f"Unexpected {self.pool} pooling")


def channel_mult_for_size(image_size: int) -> Tuple[int, ...]:
    """Reference script_util.py:169-184 table."""
    if image_size == 512:
        return (0.5, 1, 1, 2, 2, 4, 4)
    if image_size == 256:
        return (1, 1, 2, 2, 4, 4)
    if image_size == 128:
        return (1, 1, 2, 3, 4)
    if image_size == 64:
        return (1, 2, 3, 4)
    raise ValueError(f"unsupported image size: {image_size}")
