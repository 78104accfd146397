"""Ablate the fused decode kernel to find the bottleneck (full size, real chip).

V_dma : DMA all weight blocks, minimal compute -> isolates streaming/pipeline
V_mm  : + the two big matmuls only
V_nossd: full mixer minus the SSD small-dot block
V_full: the real kernel (pallas_decode)
"""
import functools
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from musicgen_tpu.config import MambaConfig
from musicgen_tpu.models.mamba import MambaLM
from musicgen_tpu.ops.pallas_decode import (
    DecodeDims, _decode_kernel, build_decode_params, fused_decode_step, stack_states,
    _ROWS, _HEAD_CHUNKS, _dot,
)

cfg = MambaConfig()
model = MambaLM(cfg)
rng = np.random.default_rng(0)
batch, N = 2, 500
prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, 64)), jnp.int32)
meta = jnp.asarray(rng.integers(0, cfg.metadata_vocab_size, (batch, 6)), jnp.int32)
params = model.init(jax.random.PRNGKey(0), prompt[:, :16], meta)
dims = DecodeDims.create(cfg, batch)
dp = build_decode_params(params, cfg, batch)
logits0, states = model.apply(params, prompt, meta, method=MambaLM.prefill)
carry0 = stack_states(states)

f1 = jax.jit(lambda x: x + 1.0)
x8 = jnp.zeros((8, 128), jnp.float32)
np.asarray(f1(x8))
t0 = time.perf_counter()
for _ in range(6):
    np.asarray(f1(x8))
FLOOR = (time.perf_counter() - t0) / 6
print(f"floor {FLOOR*1e3:.1f} ms", flush=True)


def timeit(name, fn, *args, reps=3):
    np.asarray(jax.tree.leaves(fn(*args))[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(jax.tree.leaves(fn(*args))[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / reps - FLOOR
    print(f"{name}: {dt/N*1e6:8.1f} us/step", flush=True)


def make_variant(mode):
    def kern(x_in_ref, w_in_ref, w_out_ref, conv_w_ref, conv_b_ref, dt_bias_ref,
             a_e_ref, d_e_ref, e_ref, norm_w_ref, ln_ref, lm_w_ref,
             conv_state_ref, ssm_state_ref,
             logits_ref, conv_state_out_ref, ssm_state_out_ref, x_scr):
        i = pl.program_id(0)
        L = dims.n_layers
        B = dims.batch
        di, dc, dh, ds = dims.d_inner, dims.conv_dim, dims.nheads, dims.d_state
        f32 = jnp.float32

        @pl.when(i == 0)
        def _():
            x_scr[:, :] = x_in_ref[:, :]

        @pl.when(i < L)
        def _mixer():
            x = x_scr[:, :]
            if mode == "dma":
                # touch each weight block minimally (forces the DMA)
                t1 = w_in_ref[0, :_ROWS, : dims.d_model].astype(f32)
                t2 = w_out_ref[0, :_ROWS, : dims.d_model].astype(f32)
                x_scr[:, :] = x + t1 * 1e-6 + t2 * 1e-6
                conv_state_out_ref[0] = conv_state_ref[0]
                ssm_state_out_ref[0] = ssm_state_ref[0]
                return
            zx = _dot(x.astype(jnp.bfloat16), w_in_ref[0])
            if mode == "mm":
                g_rows = zx[:, :di]
                conv_state_out_ref[0] = conv_state_ref[0]
                ssm_state_out_ref[0] = ssm_state_ref[0]
                x_scr[:, :] = _dot(g_rows.astype(jnp.bfloat16), w_out_ref[0])
                return
            # nossd: conv + gating but skip the SSD dots
            z = zx[:B, 0:di]
            xbc_new = zx[:B, di:di + dc]
            cw = conv_w_ref[0]
            cs = conv_state_ref[0]
            y_conv = (cs[:, 0, :] * cw[0][None] + cs[:, 1, :] * cw[1][None]
                      + cs[:, 2, :] * cw[2][None] + xbc_new * cw[3][None]
                      + conv_b_ref[0])
            conv_state_out_ref[0, :, 0, :] = cs[:, 1, :]
            conv_state_out_ref[0, :, 1, :] = cs[:, 2, :]
            conv_state_out_ref[0, :, 2, :] = xbc_new
            xbc = y_conv * jax.nn.sigmoid(y_conv)
            x_ssd = xbc[:, :di]
            ssm_state_out_ref[0] = ssm_state_ref[0] * 0.999
            y = x_ssd * d_e_ref[0]
            g = y * (z * jax.nn.sigmoid(z))
            var = jnp.mean(g * g, axis=-1, keepdims=True)
            g = g * jax.lax.rsqrt(var + 1e-5) * norm_w_ref[0, 0][None, :]
            g_rows = jnp.concatenate([g, jnp.zeros((_ROWS - B, di), f32)], axis=0)
            x_scr[:, :] = _dot(g_rows.astype(jnp.bfloat16), w_out_ref[0])

        @pl.when(i >= L)
        def _head():
            x = x_scr[:, :]
            logits_ref[:, :] = _dot(x.astype(jnp.bfloat16), lm_w_ref[:, :])

    return kern


def call_variant(kern, x0, carry):
    L = dims.n_layers
    B = dims.batch
    bn = B * dims.d_state
    lc = lambda i: jnp.minimum(i, L - 1)
    x_pad = jnp.pad(x0, ((0, _ROWS - B), (0, 0)))
    return pl.pallas_call(
        kern,
        grid=(L + _HEAD_CHUNKS,),
        in_specs=[
            pl.BlockSpec((_ROWS, dims.d_model), lambda i: (0, 0)),
            pl.BlockSpec((1, dims.d_model, dims.d_in_pad), lambda i: (lc(i), 0, 0)),
            pl.BlockSpec((1, dims.d_inner, dims.d_model), lambda i: (lc(i), 0, 0)),
            pl.BlockSpec((1, 4, dims.conv_dim), lambda i: (lc(i), 0, 0)),
            pl.BlockSpec((1, 1, dims.conv_dim), lambda i: (lc(i), 0, 0)),
            pl.BlockSpec((1, 1, 128), lambda i: (lc(i), 0, 0)),
            pl.BlockSpec((1, 1, dims.d_inner), lambda i: (lc(i), 0, 0)),
            pl.BlockSpec((1, 1, dims.d_inner), lambda i: (lc(i), 0, 0)),
            pl.BlockSpec((dims.nheads, dims.d_inner), lambda i: (0, 0)),
            pl.BlockSpec((1, 1, dims.d_inner), lambda i: (lc(i), 0, 0)),
            pl.BlockSpec((2, dims.d_model), lambda i: (0, 0)),
            pl.BlockSpec((dims.d_model, dims.head_chunk),
                         lambda i: (0, jnp.maximum(i - L, 0))),
            pl.BlockSpec((1, B, 3, dims.conv_dim), lambda i: (lc(i), 0, 0, 0)),
            pl.BlockSpec((1, dims.d_inner, bn), lambda i: (lc(i), 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((_ROWS, dims.head_chunk), lambda i: (0, jnp.maximum(i - L, 0))),
            pl.BlockSpec((1, B, 3, dims.conv_dim), lambda i: (lc(i), 0, 0, 0)),
            pl.BlockSpec((1, dims.d_inner, bn), lambda i: (lc(i), 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((_ROWS, dims.padded_vocab), jnp.float32),
            jax.ShapeDtypeStruct(carry[0].shape, jnp.float32),
            jax.ShapeDtypeStruct(carry[1].shape, jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((_ROWS, dims.d_model), jnp.float32)],
        input_output_aliases={12: 1, 13: 2},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=("arbitrary",),
        ),
    )(x_pad, dp["w_in"], dp["w_out"], dp["conv_w"], dp["conv_b"], dp["dt_bias"],
      dp["a_e"], dp["d_e"], dp["e_mat"], dp["norm_w"], dp["ln"], dp["lm_w"],
      carry[0], carry[1])


for mode in ("dma", "mm", "nossd"):
    kern = make_variant(mode)

    @jax.jit
    def scan_variant(dp_embed, carry, kern=kern):
        x0 = dp_embed[jnp.asarray([5, 7])]
        def b(c, _):
            logits, cs, ss = call_variant(kern, x0 + c[0][0, 0, 0, 0] * 1e-9, (c[0], c[1]))
            return (cs, ss), logits[0, 0]
        (cs, ss), ys = jax.lax.scan(b, carry, None, length=N)
        return ys

    timeit(f"V_{mode:6s}", scan_variant, dp["embed"], carry0)

# full kernel for reference
@jax.jit
def scan_full(dp, carry):
    x0 = dp["embed"][jnp.asarray([5, 7])]
    def b(c, _):
        logits, cs, ss = fused_decode_step(
            x0, dp["w_in"], dp["w_out"], dp["conv_w"], dp["conv_b"], dp["dt_bias"],
            dp["a_e"], dp["d_e"], dp["e_mat"], dp["norm_w"], dp["ln"], dp["lm_w"],
            c[0], c[1], dims)
        return (cs, ss), logits[0, 0]
    (cs, ss), ys = jax.lax.scan(b, carry, None, length=N)
    return ys

timeit("V_full  ", scan_full, dp, carry0)
