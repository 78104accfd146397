"""Torch-checkpoint interop (musicgen_tpu.interop.torch_import).

Transformer import is validated end-to-end against the actual reference
torch model (reference models/transformer/model_transformer.py): we build
it, save its state_dict, import, and assert logit equality — i.e. exactly
the migration path a reference user takes with their trained `.pth`.

mamba / xlstm / classifier have no torch-side oracle in this image
(mamba_ssm and the NX-AI xlstm package are absent), so they are pinned by
(a) shape-strict mapping against the documented layouts, (b) export->import
round-trips reproducing the exact param tree, and (c) loud-failure tests
for missing/misshapen/extra keys.
"""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from musicgen_tpu.config import (
    ClassifierConfig,
    MambaConfig,
    NUM_META,
    TransformerConfig,
    XLSTMConfig,
)
from musicgen_tpu.interop import export_state_dict, import_state_dict
from musicgen_tpu.models.mamba import MambaLM
from musicgen_tpu.models.transformer import TransformerLM
from musicgen_tpu.models.xlstm import XLSTMClassifier, XLSTMLM


def _tree_shapes(tree):
    return jax.tree_util.tree_map(lambda a: tuple(a.shape), tree)


def _assert_tree_equal(a, b, atol=0.0):
    flat_a, tdef_a = jax.tree_util.tree_flatten(a)
    flat_b, tdef_b = jax.tree_util.tree_flatten(b)
    assert tdef_a == tdef_b
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol)


# ---------------------------------------------------------------------------
# Transformer: real torch oracle
# ---------------------------------------------------------------------------

def test_transformer_import_matches_reference_torch():
    torch = pytest.importorskip("torch")
    from tests.test_torch_parity import _load_reference_transformer, _small_params

    p = _small_params(vocab_size=64, meta_vocab=9, n_embd=32, n_heads=2,
                      n_layer=2, block_len=48)
    ref_mod = _load_reference_transformer()
    torch.manual_seed(3)
    tmodel = ref_mod.Transformer(p).eval()

    cfg = TransformerConfig(
        n_embd=p.n_embd, n_heads=p.n_heads, n_layer=p.n_layer,
        block_len=p.block_len, dropout=0.0, vocab_size=p.vocab_size,
        metadata_vocab_size=p.metadata_vocab_size,
        attention_impl="torch_exact",
    )
    variables = import_state_dict("transformer", tmodel.state_dict(), cfg)
    fmodel = TransformerLM(cfg)

    rng = np.random.default_rng(0)
    tokens = rng.integers(0, p.vocab_size, (2, p.block_len))
    meta = rng.integers(0, 9, (2, NUM_META))
    flogits = fmodel.apply(
        variables, jnp.asarray(tokens, jnp.int32), jnp.asarray(meta, jnp.int32)
    )
    with torch.no_grad():
        tlogits = tmodel(
            torch.from_numpy(tokens).long(), torch.from_numpy(meta).long()
        ).numpy()
    np.testing.assert_allclose(
        np.asarray(flogits)[..., : p.vocab_size], tlogits, atol=2e-4
    )
    # Vocab-padding columns must never be samplable.
    assert np.all(np.asarray(flogits)[..., p.vocab_size:] < -1e8)


def test_transformer_export_roundtrip():
    torch = pytest.importorskip("torch")
    from tests.test_torch_parity import _load_reference_transformer, _small_params

    p = _small_params(vocab_size=64, meta_vocab=9, n_embd=32, n_heads=2,
                      n_layer=2, block_len=48)
    ref_mod = _load_reference_transformer()
    torch.manual_seed(4)
    tmodel = ref_mod.Transformer(p).eval()
    cfg = TransformerConfig(
        n_embd=p.n_embd, n_heads=p.n_heads, n_layer=p.n_layer,
        block_len=p.block_len, dropout=0.0, vocab_size=p.vocab_size,
        metadata_vocab_size=p.metadata_vocab_size,
    )
    variables = import_state_dict("transformer", tmodel.state_dict(), cfg)
    sd = export_state_dict("transformer", variables, cfg)
    # Exported dict loads back into the reference torch model bit-exactly.
    tmodel.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False,  # tril buffers are derived, not exported
    )
    for k, v in tmodel.state_dict().items():
        if k.endswith(".tril"):
            continue
        np.testing.assert_array_equal(v.numpy(), sd[k])


# ---------------------------------------------------------------------------
# Mamba: documented mamba_ssm layout, synthetic checkpoint
# ---------------------------------------------------------------------------

def _mamba_cfg():
    return MambaConfig(d_model=32, n_layers=2, d_state=8, headdim=8,
                       vocab_size=60, metadata_vocab_size=9, ssd_impl="xla")


def _synthetic_mamba_sd(cfg, seed=0):
    rng = np.random.default_rng(seed)
    d, v = cfg.d_model, cfg.vocab_size
    d_in_proj = 2 * cfg.d_inner + 2 * cfg.ngroups * cfg.d_state + cfg.nheads
    sd = {
        "token_embedding.weight": rng.normal(size=(v, d)).astype(np.float32),
        "metadata_embedding.weight": rng.normal(size=(9, d)).astype(np.float32),
        "output_layer.weight": rng.normal(size=(v, d)).astype(np.float32),
        "output_layer.bias": rng.normal(size=(v,)).astype(np.float32),
        "norm.weight": rng.normal(size=(d,)).astype(np.float32),
        "norm.bias": rng.normal(size=(d,)).astype(np.float32),
    }
    for i in range(cfg.n_layers):
        tb = f"layers.{i}."
        sd[tb + "in_proj.weight"] = rng.normal(
            size=(d_in_proj, d)).astype(np.float32)
        sd[tb + "conv1d.weight"] = rng.normal(
            size=(cfg.conv_dim, 1, cfg.d_conv)).astype(np.float32)
        sd[tb + "conv1d.bias"] = rng.normal(
            size=(cfg.conv_dim,)).astype(np.float32)
        sd[tb + "dt_bias"] = rng.normal(size=(cfg.nheads,)).astype(np.float32)
        sd[tb + "A_log"] = rng.normal(size=(cfg.nheads,)).astype(np.float32)
        sd[tb + "D"] = rng.normal(size=(cfg.nheads,)).astype(np.float32)
        sd[tb + "norm.weight"] = rng.normal(
            size=(cfg.d_inner,)).astype(np.float32)
        sd[tb + "out_proj.weight"] = rng.normal(
            size=(d, cfg.d_inner)).astype(np.float32)
    return sd


def test_mamba_import_structure_and_placement():
    cfg = _mamba_cfg()
    sd = _synthetic_mamba_sd(cfg)
    variables = import_state_dict("mamba", sd, cfg)

    model = MambaLM(cfg)
    template = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 8), jnp.int32), jnp.zeros((1, NUM_META), jnp.int32),
    )
    assert _tree_shapes(variables) == _tree_shapes(
        jax.tree_util.tree_map(np.asarray, template)
    )
    p = variables["params"]
    # Orientation spot checks: torch (out, in) -> flax (in, out).
    np.testing.assert_array_equal(
        p["layer_0"]["in_proj"]["kernel"], sd["layers.0.in_proj.weight"].T
    )
    np.testing.assert_array_equal(
        p["layer_1"]["conv_w"], sd["layers.1.conv1d.weight"][:, 0, :].T
    )
    np.testing.assert_array_equal(
        p["token_embedding"]["embedding"][: cfg.vocab_size],
        sd["token_embedding.weight"],
    )
    # The imported tree must run through the real forward.
    logits = model.apply(
        variables,
        jnp.zeros((1, 8), jnp.int32), jnp.zeros((1, NUM_META), jnp.int32),
    )
    assert np.isfinite(np.asarray(logits)).all()
    assert np.all(np.asarray(logits)[..., cfg.vocab_size:] < -1e8)


def test_mamba_export_roundtrip():
    cfg = _mamba_cfg()
    sd = _synthetic_mamba_sd(cfg, seed=1)
    variables = import_state_dict("mamba", sd, cfg)
    sd2 = export_state_dict("mamba", variables, cfg)
    assert sorted(sd2) == sorted(sd)
    for k in sd:
        np.testing.assert_array_equal(sd2[k], sd[k])


def test_mamba_ddp_module_prefix_stripped():
    cfg = _mamba_cfg()
    sd = {f"module.{k}": v for k, v in _synthetic_mamba_sd(cfg).items()}
    variables = import_state_dict("mamba", sd, cfg)
    assert "layer_0" in variables["params"]


# ---------------------------------------------------------------------------
# xLSTM / classifier: round-trip + strictness
# ---------------------------------------------------------------------------

def _xlstm_cfg():
    return XLSTMConfig(embedding_dim=32, num_blocks=3, slstm_at=(1,),
                       num_heads=4, vocab_size=60, metadata_vocab_size=9,
                       context_length=22)


def _normalize_vocab_padding(variables, cfg, has_lm_head=True):
    """Rewrite the padded-vocab regions of a fresh init to the canonical
    values the importer emits (zeros; -1e9 head bias), so an
    export->import round trip compares equal outside real weights."""
    p = variables["params"]
    v = cfg.vocab_size
    emb = np.array(p["token_embedding"]["embedding"])
    emb[v:] = 0.0
    p["token_embedding"]["embedding"] = emb
    if has_lm_head:
        kern = np.array(p["lm_head"]["kernel"])
        kern[:, v:] = 0.0
        p["lm_head"]["kernel"] = kern
        bias = np.array(p["lm_head"]["bias"])
        bias[v:] = -1e9
        p["lm_head"]["bias"] = bias


def test_xlstm_roundtrip_through_nxai_layout():
    cfg = _xlstm_cfg()
    model = XLSTMLM(cfg)
    variables = jax.tree_util.tree_map(np.asarray, model.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, 8), jnp.int32), jnp.zeros((1, NUM_META), jnp.int32),
    ))
    # Freshly-initialized sLSTM input gates are full-Dense; make them
    # block-diagonal (as NX-AI weights are) so the layout can hold them.
    p = variables["params"]["stack"]["block_1"]["slstm"]
    for gate in ("w_i", "w_f", "w_z", "w_o"):
        kern = np.asarray(p[gate]["kernel"])
        dh = cfg.embedding_dim // cfg.num_heads
        mask = np.zeros_like(kern, dtype=bool)
        for h in range(cfg.num_heads):
            mask[h * dh:(h + 1) * dh, h * dh:(h + 1) * dh] = True
        p[gate]["kernel"] = np.where(mask, kern, 0.0)
    _normalize_vocab_padding(variables, cfg)

    sd = export_state_dict("xlstm", variables, cfg)
    # Layout sanity vs the NX-AI shapes.
    assert sd["layers.blocks.0.xlstm.proj_up.weight"].shape == (128, 32)
    assert sd["layers.blocks.0.xlstm.q_proj.weight"].shape == (16, 4, 4)
    assert sd["layers.blocks.1.xlstm.slstm_cell._recurrent_kernel_"].shape == \
        (4, 8, 4, 8)
    assert sd["layers.blocks.1.xlstm.igate.weight"].shape == (4, 8, 8)

    back = import_state_dict("xlstm", sd, cfg)
    # Zero the (unrepresented) ln biases on the original for comparison —
    # flax inits them zero already, so the trees match exactly.
    _assert_tree_equal(back, variables)

    # And the round-tripped params drive the real forward.
    logits = model.apply(
        back, jnp.zeros((1, 8), jnp.int32), jnp.zeros((1, NUM_META), jnp.int32)
    )
    assert np.isfinite(np.asarray(logits)).all()


def test_classifier_roundtrip_and_dead_head_discard():
    cfg = ClassifierConfig(embedding_dim=32, num_blocks=2, slstm_at=(1,),
                           num_heads=4, vocab_size=60, metadata_vocab_size=9,
                           context_length=16)
    model = XLSTMClassifier(cfg)
    variables = jax.tree_util.tree_map(np.asarray, model.init(
        jax.random.PRNGKey(2), jnp.zeros((1, 8), jnp.int32),
    ))
    p = variables["params"]["stack"]["block_1"]["slstm"]
    dh = cfg.embedding_dim // cfg.num_heads
    for gate in ("w_i", "w_f", "w_z", "w_o"):
        kern = np.asarray(p[gate]["kernel"])
        mask = np.zeros_like(kern, dtype=bool)
        for h in range(cfg.num_heads):
            mask[h * dh:(h + 1) * dh, h * dh:(h + 1) * dh] = True
        p[gate]["kernel"] = np.where(mask, kern, 0.0)
    _normalize_vocab_padding(variables, cfg, has_lm_head=False)

    sd = export_state_dict("classifier", variables, cfg)
    # The reference Classifier's dead output_layer is emitted (zeros) and
    # must be silently re-discarded on import.
    assert sd["output_layer.weight"].shape == (60, 32)
    back = import_state_dict("classifier", sd, cfg)
    _assert_tree_equal(back, variables)


def test_strict_errors():
    cfg = _mamba_cfg()
    sd = _synthetic_mamba_sd(cfg)

    missing = dict(sd)
    del missing["layers.0.A_log"]
    with pytest.raises(KeyError, match="A_log"):
        import_state_dict("mamba", missing, cfg)

    misshapen = dict(sd)
    misshapen["layers.0.in_proj.weight"] = np.zeros((3, 3), np.float32)
    with pytest.raises(ValueError, match="in_proj"):
        import_state_dict("mamba", misshapen, cfg)

    extra = dict(sd)
    extra["layers.0.unexpected_param"] = np.zeros((1,), np.float32)
    with pytest.raises(ValueError, match="unconsumed"):
        import_state_dict("mamba", extra, cfg)


def test_export_rejects_non_blockdiagonal_slstm_gates():
    cfg = _xlstm_cfg()
    model = XLSTMLM(cfg)
    variables = jax.tree_util.tree_map(np.asarray, model.init(
        jax.random.PRNGKey(5),
        jnp.zeros((1, 8), jnp.int32), jnp.zeros((1, NUM_META), jnp.int32),
    ))
    # Fresh full-Dense gates have off-block mass: exact export must refuse.
    with pytest.raises(ValueError, match="block-diagonal"):
        export_state_dict("xlstm", variables, cfg)


def test_import_cli_transformer(tmp_path):
    """End-to-end CLI: reference-size .pth -> orbax checkpoint loadable by
    the trainer's load_checkpoint."""
    torch = pytest.importorskip("torch")
    from tests.test_torch_parity import _load_reference_transformer, _small_params
    import optax

    from musicgen_tpu.interop import import_state_dict as imp
    from musicgen_tpu.train import trainer as T

    p = _small_params(vocab_size=64, meta_vocab=9, n_embd=32, n_heads=2,
                      n_layer=2, block_len=48)
    ref_mod = _load_reference_transformer()
    torch.manual_seed(6)
    tmodel = ref_mod.Transformer(p)
    cfg = TransformerConfig(
        n_embd=p.n_embd, n_heads=p.n_heads, n_layer=p.n_layer,
        block_len=p.block_len, vocab_size=p.vocab_size,
        metadata_vocab_size=p.metadata_vocab_size,
    )
    variables = imp("transformer", tmodel.state_dict(), cfg)
    optimizer = optax.adam(5e-5)
    state = T.TrainState(variables, optimizer.init(variables), 0)
    path = T.save_checkpoint(str(tmp_path / "ckpt"), state, 1.23, keep=0)
    restored = T.load_checkpoint(path, T.TrainState(
        variables, optimizer.init(variables), 0))
    _assert_tree_equal(restored.params, variables)
