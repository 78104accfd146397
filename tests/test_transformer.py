"""TransformerLM tests: shapes, rel-shift semantics vs torch, and exact
equivalence of the cached step decode vs the reference-style full re-forward
of the slid window."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from musicgen_tpu.config import NUM_META, TransformerConfig
from musicgen_tpu.models.transformer import TransformerLM
from musicgen_tpu.ops.attention import rel_shift, meta_causal_mask
from musicgen_tpu.sample.cache import step_geometry, token_slot

SMALL = TransformerConfig(
    n_embd=64, n_heads=4, n_layer=2, block_len=16, dropout=0.0,
    vocab_size=97, metadata_vocab_size=11,
)


@pytest.fixture(scope="module")
def model_and_params():
    model = TransformerLM(SMALL)
    rng = jax.random.PRNGKey(0)
    tokens = jnp.zeros((1, SMALL.block_len), dtype=jnp.int32)
    meta = jnp.zeros((1, NUM_META), dtype=jnp.int32)
    params = model.init(rng, tokens, meta)
    return model, params


def test_rel_shift_matches_torch_trick():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 7, 7)).astype(np.float32)

    xt = torch.tensor(x)
    b, t, _ = xt.size()
    zero_pad = torch.zeros((b, t, 1))
    x_padded = torch.cat([zero_pad, xt], dim=2)
    expected = x_padded.view(b, t + 1, t)[:, 1:, :].numpy()

    got = np.asarray(rel_shift(jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_rel_shift_index_semantics():
    """Below the diagonal, shifted[t, s] = x[t, s - t + T - 1]."""
    t = 9
    x = np.arange(t * t, dtype=np.float32).reshape(1, t, t)
    y = np.asarray(rel_shift(jnp.asarray(x)))[0]
    for i in range(t):
        for j in range(i + 1):
            assert y[i, j] == x[0, i, j - i + t - 1]


def test_meta_causal_mask():
    m = np.asarray(meta_causal_mask(10))
    for i in range(10):
        for j in range(10):
            visible = (j <= i) or (j < NUM_META)
            assert (m[i, j] == 0.0) == visible


def test_forward_shapes(model_and_params):
    model, params = model_and_params
    tokens = jnp.arange(2 * SMALL.block_len).reshape(2, -1) % SMALL.vocab_size
    meta = jnp.ones((2, NUM_META), dtype=jnp.int32)
    logits = model.apply(params, tokens, meta)
    assert logits.shape == (2, SMALL.block_len, SMALL.vocab_size)


def test_meta_conditioning_changes_logits(model_and_params):
    model, params = model_and_params
    tokens = jnp.ones((1, SMALL.block_len), dtype=jnp.int32)
    l0 = model.apply(params, tokens, jnp.zeros((1, NUM_META), jnp.int32))
    l1 = model.apply(params, tokens, jnp.ones((1, NUM_META), jnp.int32))
    assert not np.allclose(np.asarray(l0), np.asarray(l1))


def test_cached_step_matches_reforward_single_layer_growing():
    """Plumbing validation: with ONE layer and reference-growing geometry,
    cached decode equals the full re-forward exactly while the window grows.

    (For deeper stacks the reference's T-dependent interior rel indices make
    any cache mathematically unable to match a re-forward — the production
    sampler instead uses the fixed training geometry; see sample/cache.py.)
    """
    cfg = TransformerConfig(
        n_embd=64, n_heads=4, n_layer=1, block_len=16, dropout=0.0,
        vocab_size=97, metadata_vocab_size=11,
    )
    model = TransformerLM(cfg)
    L, P = cfg.block_len, 8
    rng = np.random.default_rng(42)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(2, P)), jnp.int32)
    meta = jnp.asarray(rng.integers(0, cfg.metadata_vocab_size, size=(2, NUM_META)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), prompt, meta)

    logits_full, caches = model.apply(params, prompt, meta, method=TransformerLM.prefill)
    np.testing.assert_allclose(
        np.asarray(logits_full), np.asarray(model.apply(params, prompt, meta)),
        rtol=1e-5, atol=1e-5,
    )
    assert caches[0]["k"].shape[2] == cfg.seq_len  # padded to all slots

    stream = np.asarray(prompt)
    for j in range(L - P):
        ref_logits = model.apply(params, jnp.asarray(stream), meta)
        next_tok = jnp.argmax(ref_logits[:, -1, :], axis=-1).astype(jnp.int32)

        total = jnp.int32(P + j + 1)  # including the token being stepped
        ages, rel_base = step_geometry(total, L, streaming=False)
        step_logits, caches = model.apply(
            params, next_tok, caches,
            token_slot(jnp.int32(P + j), L), ages, rel_base,
            method=TransformerLM.step,
        )
        stream = np.concatenate([stream, np.asarray(next_tok)[:, None]], axis=1)

        ref_logits2 = model.apply(params, jnp.asarray(stream), meta)
        np.testing.assert_allclose(
            np.asarray(step_logits), np.asarray(ref_logits2[:, -1, :]),
            rtol=2e-5, atol=2e-5, err_msg=f"step {j}",
        )


def test_streaming_step_deterministic_and_full_window_geometry(model_and_params):
    """Production streaming geometry: rel_base pinned to seq_len-1, ring
    slots reuse, all slots visible once the window is full."""
    model, params = model_and_params
    L = SMALL.block_len
    rng = np.random.default_rng(7)
    prompt = jnp.asarray(rng.integers(0, SMALL.vocab_size, size=(2, L)), jnp.int32)
    meta = jnp.asarray(rng.integers(0, SMALL.metadata_vocab_size, size=(2, NUM_META)), jnp.int32)
    _, caches = model.apply(params, prompt, meta, method=TransformerLM.prefill)

    total = jnp.int32(L + 1)
    ages, rel_base = step_geometry(total, L)
    assert int(rel_base) == NUM_META - 1 + L
    a = np.asarray(ages)
    assert (a >= 0).all()  # every slot visible
    assert a[NUM_META + 0] == 0  # slot 6 just overwritten by the new token

    tok = jnp.asarray([3, 4], jnp.int32)
    slot = token_slot(jnp.int32(L), L)
    l1, _ = model.apply(params, tok, caches, slot, ages, rel_base,
                        method=TransformerLM.step)
    l2, _ = model.apply(params, tok, caches, slot, ages, rel_base,
                        method=TransformerLM.step)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_relpos_step_2d_ages_matches_naive_gather():
    """The serving (B,S) per-row-ages branch computes BD as a (B,H,T)
    matmul against the whole rel table + scalar gather (HBM fix, round 5);
    it must equal the naive gather-table-rows-then-dot formula, and the 1D
    shared-ages path when every row has the same ages."""
    from musicgen_tpu.ops.attention import relpos_attention_step

    rng = np.random.default_rng(7)
    B, H, S, D, T = 3, 4, 8, 16, 12
    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    rel = jnp.asarray(rng.standard_normal((H, T, D)), jnp.float32)
    scale = D ** -0.5
    rel_base = jnp.int32(T - 1)
    # Per-row ages at different stream offsets, some slots unfilled (<0).
    ages = jnp.asarray(
        [rng.permutation(S), rng.permutation(S), [-1] * 4 + [0, 1, 2, 3]],
        jnp.int32,
    )

    out = relpos_attention_step(q, k, v, rel, scale, ages, rel_base)

    # Naive formula: gather table rows per (b, s), dot with q.
    rel_idx = np.clip(np.asarray(rel_base) - np.asarray(ages), 0, T - 1)
    gathered = np.asarray(rel)[:, rel_idx, :]  # (H, B, S, D)
    ac = np.einsum("bhd,bhsd->bhs", np.asarray(q), np.asarray(k))
    bd = np.einsum("bhd,hbsd->bhs", np.asarray(q), gathered)
    scores = (ac + bd) * scale
    vis = (np.asarray(ages) >= 0)[:, None, :]
    scores = np.where(vis, scores, -1e30)
    probs = np.exp(scores - scores.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    ref = np.einsum("bhs,bhsd->bhd", probs, np.asarray(v))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)

    # Shared ages: (B,S) broadcast of one row must equal the 1D path.
    shared = jnp.asarray(rng.permutation(S), jnp.int32)
    out1d = relpos_attention_step(q, k, v, rel, scale, shared, rel_base)
    out2d = relpos_attention_step(
        q, k, v, rel, scale, jnp.broadcast_to(shared, (B, S)), rel_base
    )
    np.testing.assert_allclose(
        np.asarray(out1d), np.asarray(out2d), rtol=1e-6, atol=1e-6
    )
