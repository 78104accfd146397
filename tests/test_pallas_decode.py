"""Fused multi-layer decode kernel vs the XLA MambaLM.step oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musicgen_tpu.config import NUM_META, MambaConfig
from musicgen_tpu.models.mamba import MambaLM
from musicgen_tpu.ops.pallas_decode import (
    DecodeDims,
    build_decode_params,
    fused_logits_step,
    stack_states,
)

INTERPRET = jax.default_backend() == "cpu"


@pytest.fixture(scope="module")
def small_setup():
    # Small-but-structured config: 3 layers, true head/state geometry.
    cfg = MambaConfig(d_model=256, n_layers=3)
    model = MambaLM(cfg)
    rng = np.random.default_rng(0)
    b, p = 2, 64
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, p)), jnp.int32)
    meta = jnp.asarray(rng.integers(0, cfg.metadata_vocab_size, (b, NUM_META)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), prompt[:, :8], meta)
    logits0, states = model.apply(params, prompt, meta, method=MambaLM.prefill)
    return cfg, model, params, prompt, meta, logits0, states


def test_fused_step_matches_xla_step(small_setup):
    cfg, model, params, prompt, meta, logits0, states = small_setup
    b = prompt.shape[0]
    dims = DecodeDims.create(cfg, b)
    dp = build_decode_params(params, cfg, b)
    carry = stack_states(states)

    tok = jnp.argmax(logits0[:, -1, :], -1).astype(jnp.int32)
    xla_states = states
    for step in range(8):
        ref_logits, xla_states = model.apply(
            params, tok, xla_states, method=MambaLM.step
        )
        fused_logits, carry = fused_logits_step(
            dp, tok, carry, cfg, dims, interpret=INTERPRET
        )
        np.testing.assert_allclose(
            np.asarray(fused_logits),
            np.asarray(ref_logits),
            rtol=0.05,
            atol=0.05 * float(jnp.abs(ref_logits).max()),
            err_msg=f"logits diverged at step {step}",
        )
        # greedy next token must agree (argmax robustness check)
        assert jnp.array_equal(
            jnp.argmax(fused_logits, -1), jnp.argmax(ref_logits, -1)
        ), f"greedy argmax diverged at step {step}"
        tok = jnp.argmax(ref_logits, -1).astype(jnp.int32)

    # states stay close after 8 steps (round-trip through unstack_states)
    from musicgen_tpu.ops.pallas_decode import unstack_states

    conv, ssm = carry
    for i, st in enumerate(unstack_states(conv, ssm, dims)):
        np.testing.assert_allclose(
            np.asarray(st["ssm"]),
            np.asarray(xla_states[i]["ssm"]),
            rtol=0.05,
            atol=0.05,
        )
        np.testing.assert_allclose(
            np.asarray(st["conv"]),
            np.asarray(xla_states[i]["conv"]),
            rtol=0.05,
            atol=0.05,  # conv tail holds raw bf16-matmul outputs
        )


def test_fused_generation_is_grammatical(small_setup):
    """Drive the full sampler through the fused step (mamba_fused adapter)."""
    from musicgen_tpu.config import VOCAB
    from musicgen_tpu.ops.grammar import field_bucket
    from musicgen_tpu.sample.sampler import SamplerConfig, make_sampler, sample_tokens

    cfg, model, params, prompt, meta, logits0, states = small_setup
    prefill, step = make_sampler(
        model, "mamba", block_len=64, fused_decode=True, cfg=cfg,
        batch=prompt.shape[0], interpret=INTERPRET,
    )
    scfg = SamplerConfig(num_tokens=12, greedy=True)
    init_logits, state = prefill(params, prompt, meta)
    dp = build_decode_params(params, cfg, prompt.shape[0])
    toks = sample_tokens(step, dp, init_logits, state, prompt, scfg, jax.random.PRNGKey(1))
    assert toks.shape == (2, 12)
    # grammar: successive field buckets must follow the allowed transitions
    stream = np.asarray(jnp.concatenate([prompt[:, -1:], toks], axis=1))
    allowed = {0: {1}, 1: {2}, 2: {3, 4}, 3: {4}, 4: {0}}
    buckets = np.asarray(field_bucket(jnp.asarray(stream)))
    for row in buckets:
        for a, b_ in zip(row[:-1], row[1:]):
            assert b_ in allowed[a], (row, a, b_)


def test_fused_step_int8_close_to_oracle(small_setup):
    """W8A8 variant: logits within quantization tolerance of the XLA step."""
    cfg, model, params, prompt, meta, logits0, states = small_setup
    b = prompt.shape[0]
    dims = DecodeDims.create(cfg, b)
    dp = build_decode_params(params, cfg, b, quant="int8")
    assert dp["w_in"].dtype == jnp.int8 and dp["lm_w"].dtype == jnp.int8
    carry = stack_states(states)

    tok = jnp.argmax(logits0[:, -1, :], -1).astype(jnp.int32)
    xla_states = states
    agree = 0
    for step in range(4):
        ref_logits, xla_states = model.apply(
            params, tok, xla_states, method=MambaLM.step
        )
        q_logits, carry = fused_logits_step(
            dp, tok, carry, cfg, dims, interpret=INTERPRET
        )
        scale = float(jnp.abs(ref_logits).max())
        diff = float(jnp.abs(q_logits - ref_logits).max()) / scale
        assert diff < 0.25, f"int8 rel diff {diff} at step {step}"
        agree += int(
            jnp.mean(
                (jnp.argmax(q_logits, -1) == jnp.argmax(ref_logits, -1)).astype(
                    jnp.float32
                )
            )
            > 0.49
        )
        tok = jnp.argmax(ref_logits, -1).astype(jnp.int32)
    # untrained near-uniform logits are the worst case for argmax agreement;
    # require it on at least half the steps
    assert agree >= 2, f"argmax agreement too low ({agree}/4)"


def test_generate_fused_integration(small_setup):
    """generate(fused=True) end-to-end on the interpret path: grammatical
    stream, correct shape, all quant modes."""
    from musicgen_tpu.ops.grammar import field_bucket
    from musicgen_tpu.sample.sampler import generate

    cfg, model, params, prompt, meta, logits0, states = small_setup
    for quant in ("bf16", "int8", "int8w"):
        streams = generate(
            model, params, "mamba", prompt, meta, 6, prompt.shape[1],
            jax.random.PRNGKey(0), fused=True, quant=quant,
        )
        assert streams.shape == (prompt.shape[0], prompt.shape[1] + 6)
        new = np.asarray(streams[:, prompt.shape[1]:])
        assert (new >= 0).all() and (new < cfg.vocab_size).all()
        # grammar: successive fields follow the allowed-transition graph
        prev = np.asarray(prompt[:, -1])
        for t in range(new.shape[1]):
            pb = field_bucket(jnp.asarray(prev))
            nb = field_bucket(jnp.asarray(new[:, t]))
            for b_ in range(new.shape[0]):
                allowed = {0: [1], 1: [2], 2: [3, 4], 3: [4], 4: [0]}[int(pb[b_])]
                assert int(nb[b_]) in allowed, (t, b_, int(pb[b_]), int(nb[b_]))
            prev = new[:, t]


def test_fused_tail_matches_xla_tail(small_setup):
    """In-kernel grammar/penalty/top-3 vs the XLA tail on the same logits."""
    from musicgen_tpu.config import VOCAB
    from musicgen_tpu.ops.grammar import field_bucket, filtered_logits
    from musicgen_tpu.ops.pallas_decode import fused_sample_step
    from musicgen_tpu.sample.sampler import (
        _iter_top_k,
        init_penalty_state,
        penalty_divisor,
        push_token,
    )

    cfg, model, params, prompt, meta, logits0, states = small_setup
    b = prompt.shape[0]
    dims = DecodeDims.create(cfg, b)
    dp = build_decode_params(params, cfg, b)
    carry = stack_states(states)
    pen = init_penalty_state(prompt, 2048)

    tok = jnp.argmax(logits0[:, -1, :], -1).astype(jnp.int32)
    for step in range(4):
        pen = push_token(pen, tok)
        bucket_oh = jax.nn.one_hot(field_bucket(tok), 8)
        # oracle tail on the SAME kernel logits (isolates the tail math)
        ref_logits, _ = fused_logits_step(
            dp, tok, carry, cfg, dims, interpret=INTERPRET
        )
        w = filtered_logits(tok, ref_logits) / penalty_divisor(pen.hist)
        ref_vals, ref_idxs = _iter_top_k(w, 3)

        vals, idxs, carry = fused_sample_step(
            dp, tok, carry, pen.hist, bucket_oh, cfg, dims, interpret=INTERPRET
        )
        assert jnp.array_equal(idxs, ref_idxs), (
            step, np.asarray(idxs), np.asarray(ref_idxs))
        np.testing.assert_allclose(
            np.asarray(vals), np.asarray(ref_vals), rtol=2e-4, atol=2e-4,
            err_msg=f"tail vals diverged at step {step}",
        )
        tok = idxs[:, 0].astype(jnp.int32)


@pytest.mark.parametrize("b,rows", [(8, 8), (10, 16)])
def test_fused_step_large_batch(b, rows):
    """batch >= 8: the row block widens (DecodeDims.rows; b == rows hits the
    no-pad path) and results still match the XLA step — serving batches
    ride one weight stream per step."""
    cfg = MambaConfig(d_model=256, n_layers=2)
    model = MambaLM(cfg)
    rng = np.random.default_rng(3)
    p = 32
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, p)), jnp.int32)
    meta = jnp.asarray(
        rng.integers(0, cfg.metadata_vocab_size, (b, NUM_META)), jnp.int32
    )
    params = model.init(jax.random.PRNGKey(0), prompt[:, :8], meta)
    logits0, states = model.apply(params, prompt, meta, method=MambaLM.prefill)
    dims = DecodeDims.create(cfg, b)
    assert dims.rows == rows
    dp = build_decode_params(params, cfg, b)
    carry = stack_states(states)
    tok = jnp.argmax(logits0[:, -1, :], -1).astype(jnp.int32)
    ref_logits, _ = model.apply(params, tok, states, method=MambaLM.step)
    fused_logits, _ = fused_logits_step(
        dp, tok, carry, cfg, dims, interpret=INTERPRET
    )
    np.testing.assert_allclose(
        np.asarray(fused_logits), np.asarray(ref_logits),
        rtol=0.05, atol=0.05 * float(jnp.abs(ref_logits).max()),
    )
