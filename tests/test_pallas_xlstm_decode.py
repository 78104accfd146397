"""Fused full-model xLSTM decode kernel vs the XLA XLSTMLM.step oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musicgen_tpu.config import NUM_META, XLSTMConfig
from musicgen_tpu.models.xlstm import XLSTMLM
from musicgen_tpu.ops.pallas_xlstm_decode import (
    XDims,
    build_xlstm_decode_params,
    fused_xlstm_logits_step,
    fused_xlstm_sample_step,
    stack_xlstm_states,
    unstack_xlstm_states,
)

INTERPRET = jax.default_backend() == "cpu"


@pytest.fixture(scope="module")
def small_setup():
    # Small-but-structured: 5 blocks with sLSTM at (1, 3), true head geometry.
    cfg = XLSTMConfig(embedding_dim=256, num_blocks=5, slstm_at=(1, 3))
    model = XLSTMLM(cfg)
    rng = np.random.default_rng(0)
    b, p = 2, 48
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, p)), jnp.int32)
    meta = jnp.asarray(
        rng.integers(0, cfg.metadata_vocab_size, (b, NUM_META)), jnp.int32
    )
    params = model.init(jax.random.PRNGKey(0), prompt[:, :8], meta)
    logits0, states = model.apply(params, prompt, meta, method=XLSTMLM.prefill)
    return cfg, model, params, prompt, meta, logits0, states


@pytest.mark.parametrize("quant", ["bf16", "int8w"])
def test_fused_xlstm_step_matches_xla_step(small_setup, quant):
    cfg, model, params, prompt, meta, logits0, states = small_setup
    b = prompt.shape[0]
    dims = XDims.create(cfg, b)
    wp = build_xlstm_decode_params(params, cfg, b, quant=quant)
    carry = stack_xlstm_states(states, cfg, b)

    tol = 0.05 if quant == "bf16" else 0.12
    tok = jnp.argmax(logits0[:, -1, :], -1).astype(jnp.int32)
    xla_states = states
    n_steps = 6 if quant == "bf16" else 3
    for step in range(n_steps):
        ref_logits, xla_states = model.apply(
            params, tok, xla_states, method=XLSTMLM.step
        )
        fused_logits, carry = fused_xlstm_logits_step(
            wp, tok, carry, cfg, dims, interpret=INTERPRET
        )
        np.testing.assert_allclose(
            np.asarray(fused_logits),
            np.asarray(ref_logits),
            rtol=tol,
            atol=tol * float(jnp.abs(ref_logits).max()),
            err_msg=f"logits diverged at step {step} (quant={quant})",
        )
        if quant == "bf16":
            assert jnp.array_equal(
                jnp.argmax(fused_logits, -1), jnp.argmax(ref_logits, -1)
            ), f"greedy argmax diverged at step {step}"
        tok = jnp.argmax(ref_logits, -1).astype(jnp.int32)

    if quant != "bf16":
        return
    # State round-trip stays close to the XLA states after the walk.
    for i, st in enumerate(unstack_xlstm_states(carry, cfg, b)):
        ref = xla_states[i]
        if "mlstm" in st:
            for a, r_ in zip(st["mlstm"], ref["mlstm"]):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(r_), rtol=0.05, atol=0.05
                )
        else:
            for a, r_ in zip(st["slstm"], ref["slstm"]):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(r_), rtol=0.05, atol=0.05
                )
        np.testing.assert_allclose(
            np.asarray(st["conv"]), np.asarray(ref["conv"]), rtol=0.05, atol=0.05
        )


def test_fused_xlstm_tail_matches_xla_tail(small_setup):
    """In-kernel grammar/penalty/top-3 vs the XLA tail on the same logits."""
    from musicgen_tpu.ops.grammar import field_bucket, filtered_logits
    from musicgen_tpu.sample.sampler import (
        _iter_top_k,
        init_penalty_state,
        penalty_divisor,
        push_token,
    )

    cfg, model, params, prompt, meta, logits0, states = small_setup
    b = prompt.shape[0]
    dims = XDims.create(cfg, b)
    wp = build_xlstm_decode_params(params, cfg, b)
    carry = stack_xlstm_states(states, cfg, b)
    pen = init_penalty_state(prompt, 2048)

    tok = jnp.argmax(logits0[:, -1, :], -1).astype(jnp.int32)
    for step in range(4):
        pen = push_token(pen, tok)
        bucket_oh = jax.nn.one_hot(field_bucket(tok), 8)
        # oracle tail on the SAME kernel logits (isolates the tail math)
        ref_logits, _ = fused_xlstm_logits_step(
            wp, tok, carry, cfg, dims, interpret=INTERPRET
        )
        w = filtered_logits(tok, ref_logits) / penalty_divisor(pen.hist)
        ref_vals, ref_idxs = _iter_top_k(w, 3)

        vals, idxs, carry = fused_xlstm_sample_step(
            wp, tok, carry, pen.hist, bucket_oh, cfg, dims, interpret=INTERPRET
        )
        assert jnp.array_equal(idxs, ref_idxs), (
            step, np.asarray(idxs), np.asarray(ref_idxs))
        np.testing.assert_allclose(
            np.asarray(vals), np.asarray(ref_vals), rtol=2e-4, atol=2e-4,
            err_msg=f"tail vals diverged at step {step}",
        )
        tok = idxs[:, 0].astype(jnp.int32)


def test_generate_fused_xlstm_integration(small_setup):
    """generate(fused=True) end-to-end on the interpret path: grammatical
    stream, correct shape, both quant modes."""
    from musicgen_tpu.ops.grammar import field_bucket
    from musicgen_tpu.sample.sampler import generate

    cfg, model, params, prompt, meta, logits0, states = small_setup
    for quant in ("bf16", "int8w"):
        streams = generate(
            model, params, "xlstm", prompt, meta, 6, prompt.shape[1],
            jax.random.PRNGKey(0), fused=True, quant=quant,
        )
        assert streams.shape == (prompt.shape[0], prompt.shape[1] + 6)
        new = np.asarray(streams[:, prompt.shape[1]:])
        assert (new >= 0).all() and (new < cfg.vocab_size).all()
        prev = np.asarray(prompt[:, -1])
        for t in range(new.shape[1]):
            pb = field_bucket(jnp.asarray(prev))
            nb = field_bucket(jnp.asarray(new[:, t]))
            for b_ in range(new.shape[0]):
                allowed = {0: [1], 1: [2], 2: [3, 4], 3: [4], 4: [0]}[int(pb[b_])]
                assert int(nb[b_]) in allowed, (t, b_, int(pb[b_]), int(nb[b_]))
            prev = new[:, t]


def test_generate_fused_xlstm_matches_xla_stream(small_setup):
    """Fused greedy stream == XLA step greedy stream (same RNG, same picks)."""
    from musicgen_tpu.sample.sampler import generate

    cfg, model, params, prompt, meta, logits0, states = small_setup
    fused = generate(
        model, params, "xlstm", prompt, meta, 8, prompt.shape[1],
        jax.random.PRNGKey(1), greedy=True, fused=True,
    )
    xla = generate(
        model, params, "xlstm", prompt, meta, 8, prompt.shape[1],
        jax.random.PRNGKey(1), greedy=True, fused=False,
    )
    assert jnp.array_equal(fused, xla), (
        np.asarray(fused[:, prompt.shape[1]:]),
        np.asarray(xla[:, prompt.shape[1]:]),
    )


def test_fused_xlstm_step_bf16_state(small_setup):
    """bf16-STORED mLSTM matrix memory (stack_xlstm_states state_dtype):
    storage-rounding only — logits track the f32-state fused path across a
    greedy walk, and the aliased write-back keeps the storage dtype."""
    cfg, model, params, prompt, meta, logits0, states = small_setup
    b = prompt.shape[0]
    dims = XDims.create(cfg, b)
    wp = build_xlstm_decode_params(params, cfg, b, quant="bf16")
    carry32 = stack_xlstm_states(states, cfg, b)
    carry16 = stack_xlstm_states(states, cfg, b, state_dtype=jnp.bfloat16)
    assert carry16[1].dtype == jnp.bfloat16
    assert carry16[2].dtype == jnp.float32  # n/m stabilizers stay f32

    tok = jnp.argmax(logits0[:, -1, :], -1).astype(jnp.int32)
    for step in range(6):
        l32, carry32 = fused_xlstm_logits_step(
            wp, tok, carry32, cfg, dims, interpret=INTERPRET
        )
        l16, carry16 = fused_xlstm_logits_step(
            wp, tok, carry16, cfg, dims, interpret=INTERPRET
        )
        assert carry16[1].dtype == jnp.bfloat16, "write-back lost the dtype"
        np.testing.assert_allclose(
            np.asarray(l16), np.asarray(l32),
            rtol=0.05, atol=0.05 * float(jnp.abs(l32).max()),
            err_msg=f"bf16-state logits diverged at step {step}",
        )
        tok = jnp.argmax(l32, -1).astype(jnp.int32)

    # Round-trip back to XLA-step state dicts casts up to f32.
    for st in unstack_xlstm_states(carry16, cfg, b):
        if "mlstm" in st:
            assert st["mlstm"][0].dtype == jnp.float32


def test_generate_fused_xlstm_sb16_integration(small_setup):
    """generate(quant='...-sb16') end-to-end: the suffix routes the bf16
    matrix-state storage through the fused path and yields a valid stream."""
    from musicgen_tpu.sample.sampler import generate

    cfg, model, params, prompt, meta, logits0, states = small_setup
    for quant in ("bf16-sb16", "int8w-sb16"):
        streams = generate(
            model, params, "xlstm", prompt, meta, 6, prompt.shape[1],
            jax.random.PRNGKey(0), fused=True, quant=quant,
        )
        assert streams.shape == (prompt.shape[0], prompt.shape[1] + 6)
        new = np.asarray(streams[:, prompt.shape[1]:])
        assert (new >= 0).all() and (new < cfg.vocab_size).all()


@pytest.mark.parametrize("quant", ["bf16", "int8w"])
def test_fused_xlstm_step_full_rows_batch(quant):
    """B == dims.rows (a full 8-slot serving batch): the kernel must not
    build zero-sized row-pad operands (Mosaic rejects (0, d) vectors —
    the round-4 serve-scheduler int8w crash)."""
    cfg = XLSTMConfig(embedding_dim=256, num_blocks=3, slstm_at=(1,))
    model = XLSTMLM(cfg)
    rng = np.random.default_rng(1)
    b, p = 8, 24
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, p)), jnp.int32)
    meta = jnp.asarray(
        rng.integers(0, cfg.metadata_vocab_size, (b, NUM_META)), jnp.int32
    )
    params = model.init(jax.random.PRNGKey(0), prompt[:, :8], meta)
    logits0, states = model.apply(params, prompt, meta, method=XLSTMLM.prefill)

    dims = XDims.create(cfg, b)
    assert dims.rows == b, "this test exists to cover the rows == B case"
    wp = build_xlstm_decode_params(params, cfg, b, quant=quant)
    carry = stack_xlstm_states(states, cfg, b)

    tok = jnp.argmax(logits0[:, -1, :], -1).astype(jnp.int32)
    ref_logits, _ = model.apply(params, tok, states, method=XLSTMLM.step)
    fused_logits, _ = fused_xlstm_logits_step(
        wp, tok, carry, cfg, dims, interpret=INTERPRET
    )
    tol = 0.05 if quant == "bf16" else 0.12
    np.testing.assert_allclose(
        np.asarray(fused_logits),
        np.asarray(ref_logits),
        rtol=tol,
        atol=tol * float(jnp.abs(ref_logits).max()),
    )
