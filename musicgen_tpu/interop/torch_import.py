"""Import reference torch `.pth` checkpoints into musicgen_tpu param trees.

The reference saves bare ``model.state_dict()`` files (reference
train.py:69-77); a user migrating from it has those as their main trained
asset. This module maps each reference model family's state-dict layout onto
the corresponding flax param tree (and back, for torch-side evaluation of
TPU-trained weights).

Validation status per family:

* ``transformer`` — validated end-to-end against the actual reference torch
  model (tests/test_torch_import.py builds reference
  models/transformer/model_transformer.py, saves its state_dict, imports it,
  and asserts logit equality).
* ``mamba`` — layout from mamba_ssm's ``Mamba2`` module (in_proj emits
  [z, x, B, C, dt]; conv over [x, B, C]; RMSNormGated ``norm``), which our
  ``MambaLM`` pins exact parameter-count parity to. The mamba_ssm package is
  not in this image, so the mapping is shape-strict rather than
  oracle-tested: every key must be present with the documented shape and
  every key must be consumed, so a layout mismatch fails loudly.
* ``xlstm`` / ``classifier`` — layout from NX-AI ``xLSTMBlockStack`` 1.x
  (reference models/xlstm/xlstm_model.py:17-42, models/classifier/model.py).
  Same shape-strict policy. Two documented assumptions that shape checks
  cannot disambiguate (square matrices): sLSTM ``_recurrent_kernel_`` is
  taken as (heads, dh_in, 4, dh_out) with gate order i,f,z,o, and
  LinearHeadwiseExpand per-head weights as (out, in) like torch Linear.

All functions take/return host numpy; nothing here touches a device.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Optional, Tuple

import numpy as np

from ..config import (
    ClassifierConfig,
    MambaConfig,
    TransformerConfig,
    XLSTMConfig,
)

# Logit bias applied to vocab-padding columns of lm_head so a padded column
# can never win argmax / receive softmax mass (torch has no pad columns).
_PAD_LOGIT_BIAS = -1e9


class StateDictMapper:
    """Shape-strict consumer of a torch state dict.

    ``take`` pops a key, asserting it exists with the expected shape;
    ``finish`` errors on unconsumed keys. This makes every mapping total: a
    checkpoint from a different layout (or a future package version) fails
    with a precise message instead of silently mis-mapping.
    """

    def __init__(self, sd: Dict[str, Any]):
        self.sd: Dict[str, np.ndarray] = {}
        for k, v in sd.items():
            # torch DDP saves under a 'module.' prefix (reference
            # train_parallel.py wraps in DistributedDataParallel).
            if k.startswith("module."):
                k = k[len("module."):]
            self.sd[k] = _to_numpy(v)

    def take(self, key: str, shape: Tuple[int, ...]) -> np.ndarray:
        if key not in self.sd:
            near = [k for k in self.sd if key.split(".")[-1] in k][:4]
            raise KeyError(
                f"state dict is missing '{key}' (closest present: {near})"
            )
        arr = self.sd.pop(key)
        if tuple(arr.shape) != tuple(shape):
            raise ValueError(
                f"'{key}' has shape {tuple(arr.shape)}, expected {tuple(shape)}"
            )
        return np.asarray(arr, np.float32)

    def take_optional(
        self, key: str, shape: Tuple[int, ...]
    ) -> Optional[np.ndarray]:
        if key not in self.sd:
            return None
        return self.take(key, shape)

    def discard(self, predicate) -> None:
        for k in [k for k in self.sd if predicate(k)]:
            del self.sd[k]

    def finish(self) -> None:
        if self.sd:
            raise ValueError(
                "unconsumed state-dict keys (layout mismatch?): "
                f"{sorted(self.sd)[:8]}{' ...' if len(self.sd) > 8 else ''}"
            )


def _to_numpy(v: Any) -> np.ndarray:
    if hasattr(v, "detach"):  # torch tensor without importing torch here
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _pad_embedding(w: np.ndarray, padded_rows: int) -> np.ndarray:
    """(vocab, d) -> (padded_vocab, d); pad rows zero (never looked up)."""
    out = np.zeros((padded_rows, w.shape[1]), np.float32)
    out[: w.shape[0]] = w
    return out


def _pad_head(
    w: np.ndarray, b: np.ndarray, padded_cols: int
) -> Tuple[np.ndarray, np.ndarray]:
    """torch Linear (vocab, d)+(vocab,) -> flax kernel (d, padded)+bias.

    Padding columns get a large negative bias so they can never be sampled
    or win an argmax."""
    kernel = np.zeros((w.shape[1], padded_cols), np.float32)
    kernel[:, : w.shape[0]] = w.T
    bias = np.full((padded_cols,), _PAD_LOGIT_BIAS, np.float32)
    bias[: w.shape[0]] = b
    return kernel, bias


# ---------------------------------------------------------------------------
# Transformer (reference models/transformer/model_transformer.py)
# ---------------------------------------------------------------------------

def import_transformer(
    sd: Dict[str, Any], cfg: Optional[TransformerConfig] = None
) -> Dict[str, Any]:
    """Reference per-head q/k/v Linears concatenate head-major into the fused
    Dense kernels (matching torch.cat([h(x) for h in heads], dim=-1),
    model_transformer.py:50); torch Linear weights are (out, in) so kernels
    transpose. `tril` causal-mask buffers are discarded (derived data)."""
    cfg = cfg or TransformerConfig()
    m = StateDictMapper(sd)
    m.discard(lambda k: k.endswith(".tril"))
    d, hd, v = cfg.n_embd, cfg.n_embd // cfg.n_heads, cfg.vocab_size
    seq = cfg.seq_len

    params: Dict[str, Any] = {}
    params["token_embedding"] = {
        "embedding": _pad_embedding(
            m.take("token_embedding_table.weight", (v, d)), cfg.padded_vocab
        )
    }
    params["metadata_embedding"] = {
        "embedding": m.take(
            "metadata_embedding_table.weight", (cfg.metadata_vocab_size, d)
        )
    }
    params["ln_f"] = {
        "scale": m.take("ln_f.weight", (d,)),
        "bias": m.take("ln_f.bias", (d,)),
    }
    k, b = _pad_head(
        m.take("lm_head.weight", (v, d)),
        m.take("lm_head.bias", (v,)),
        cfg.padded_vocab,
    )
    params["lm_head"] = {"kernel": k, "bias": b}

    for i in range(cfg.n_layer):
        tb = f"blocks.{i}."
        blk: Dict[str, Any] = {
            "ln1": {
                "scale": m.take(tb + "ln1.weight", (d,)),
                "bias": m.take(tb + "ln1.bias", (d,)),
            },
            "ln2": {
                "scale": m.take(tb + "ln2.weight", (d,)),
                "bias": m.take(tb + "ln2.bias", (d,)),
            },
        }
        attn: Dict[str, Any] = {}
        for proj, tname in (("q", "query"), ("k", "key"), ("v", "value")):
            cols = [
                m.take(tb + f"sa.heads.{h}.{tname}.weight", (hd, d)).T
                for h in range(cfg.n_heads)
            ]
            attn[proj] = {"kernel": np.concatenate(cols, axis=1)}
        attn["rel_pos_emb"] = np.stack(
            [
                m.take(tb + f"sa.heads.{h}.rel_pos_emb", (seq, hd))
                for h in range(cfg.n_heads)
            ]
        )
        attn["proj"] = {
            "kernel": m.take(tb + "sa.proj.weight", (d, d)).T,
            "bias": m.take(tb + "sa.proj.bias", (d,)),
        }
        blk["attn"] = attn
        blk["mlp"] = {
            "fc": {
                "kernel": m.take(tb + "ffwd.net.0.weight", (4 * d, d)).T,
                "bias": m.take(tb + "ffwd.net.0.bias", (4 * d,)),
            },
            "out": {
                "kernel": m.take(tb + "ffwd.net.2.weight", (d, 4 * d)).T,
                "bias": m.take(tb + "ffwd.net.2.bias", (d,)),
            },
        }
        params[f"block_{i}"] = blk
    m.finish()
    return {"params": params}


def export_transformer(
    params: Dict[str, Any], cfg: Optional[TransformerConfig] = None
) -> Dict[str, np.ndarray]:
    """Inverse of import_transformer (drops vocab padding; no tril buffers —
    torch re-derives them at construction)."""
    cfg = cfg or TransformerConfig()
    p = params["params"]
    d, hd, v = cfg.n_embd, cfg.n_embd // cfg.n_heads, cfg.vocab_size
    sd: Dict[str, np.ndarray] = {
        "token_embedding_table.weight": np.asarray(
            p["token_embedding"]["embedding"]
        )[:v],
        "metadata_embedding_table.weight": np.asarray(
            p["metadata_embedding"]["embedding"]
        ),
        "ln_f.weight": np.asarray(p["ln_f"]["scale"]),
        "ln_f.bias": np.asarray(p["ln_f"]["bias"]),
        "lm_head.weight": np.asarray(p["lm_head"]["kernel"]).T[:v],
        "lm_head.bias": np.asarray(p["lm_head"]["bias"])[:v],
    }
    for i in range(cfg.n_layer):
        blk, tb = p[f"block_{i}"], f"blocks.{i}."
        sd[tb + "ln1.weight"] = np.asarray(blk["ln1"]["scale"])
        sd[tb + "ln1.bias"] = np.asarray(blk["ln1"]["bias"])
        sd[tb + "ln2.weight"] = np.asarray(blk["ln2"]["scale"])
        sd[tb + "ln2.bias"] = np.asarray(blk["ln2"]["bias"])
        for proj, tname in (("q", "query"), ("k", "key"), ("v", "value")):
            kern = np.asarray(blk["attn"][proj]["kernel"])  # (d, d)
            for h in range(cfg.n_heads):
                sd[tb + f"sa.heads.{h}.{tname}.weight"] = kern[
                    :, h * hd : (h + 1) * hd
                ].T
        rel = np.asarray(blk["attn"]["rel_pos_emb"])
        for h in range(cfg.n_heads):
            sd[tb + f"sa.heads.{h}.rel_pos_emb"] = rel[h]
        sd[tb + "sa.proj.weight"] = np.asarray(blk["attn"]["proj"]["kernel"]).T
        sd[tb + "sa.proj.bias"] = np.asarray(blk["attn"]["proj"]["bias"])
        sd[tb + "ffwd.net.0.weight"] = np.asarray(blk["mlp"]["fc"]["kernel"]).T
        sd[tb + "ffwd.net.0.bias"] = np.asarray(blk["mlp"]["fc"]["bias"])
        sd[tb + "ffwd.net.2.weight"] = np.asarray(blk["mlp"]["out"]["kernel"]).T
        sd[tb + "ffwd.net.2.bias"] = np.asarray(blk["mlp"]["out"]["bias"])
    return sd


# ---------------------------------------------------------------------------
# Mamba (reference models/mamba/mamba.py + mamba_ssm Mamba2 layout)
# ---------------------------------------------------------------------------

def import_mamba(
    sd: Dict[str, Any], cfg: Optional[MambaConfig] = None
) -> Dict[str, Any]:
    """mamba_ssm Mamba2 per-layer keys: in_proj.weight (d_in_proj, d_model)
    emitting [z, x, B, C, dt] (same order as MambaMixer._split_in_proj),
    conv1d.weight (conv_dim, 1, k) grouped depthwise over [x, B, C],
    dt_bias/A_log/D (nheads,), norm.weight (RMSNormGated, d_inner),
    out_proj.weight (d_model, d_inner, no bias)."""
    cfg = cfg or MambaConfig()
    m = StateDictMapper(sd)
    d, v = cfg.d_model, cfg.vocab_size
    d_in_proj = 2 * cfg.d_inner + 2 * cfg.ngroups * cfg.d_state + cfg.nheads

    params: Dict[str, Any] = {
        "token_embedding": {
            "embedding": _pad_embedding(
                m.take("token_embedding.weight", (v, d)), cfg.padded_vocab
            )
        },
        "metadata_embedding": {
            "embedding": m.take(
                "metadata_embedding.weight", (cfg.metadata_vocab_size, d)
            )
        },
        "norm": {
            "scale": m.take("norm.weight", (d,)),
            "bias": m.take("norm.bias", (d,)),
        },
    }
    k, b = _pad_head(
        m.take("output_layer.weight", (v, d)),
        m.take("output_layer.bias", (v,)),
        cfg.padded_vocab,
    )
    params["lm_head"] = {"kernel": k, "bias": b}

    for i in range(cfg.n_layers):
        tb = f"layers.{i}."
        conv_w = m.take(tb + "conv1d.weight", (cfg.conv_dim, 1, cfg.d_conv))
        params[f"layer_{i}"] = {
            "in_proj": {"kernel": m.take(tb + "in_proj.weight", (d_in_proj, d)).T},
            "conv_w": conv_w[:, 0, :].T,  # (k, conv_dim)
            "conv_b": m.take(tb + "conv1d.bias", (cfg.conv_dim,)),
            "dt_bias": m.take(tb + "dt_bias", (cfg.nheads,)),
            "A_log": m.take(tb + "A_log", (cfg.nheads,)),
            "D": m.take(tb + "D", (cfg.nheads,)),
            "norm_weight": m.take(tb + "norm.weight", (cfg.d_inner,)),
            "out_proj": {
                "kernel": m.take(tb + "out_proj.weight", (d, cfg.d_inner)).T
            },
        }
    m.finish()
    return {"params": params}


def export_mamba(
    params: Dict[str, Any], cfg: Optional[MambaConfig] = None
) -> Dict[str, np.ndarray]:
    cfg = cfg or MambaConfig()
    p = params["params"]
    v = cfg.vocab_size
    sd: Dict[str, np.ndarray] = {
        "token_embedding.weight": np.asarray(p["token_embedding"]["embedding"])[:v],
        "metadata_embedding.weight": np.asarray(
            p["metadata_embedding"]["embedding"]
        ),
        "norm.weight": np.asarray(p["norm"]["scale"]),
        "norm.bias": np.asarray(p["norm"]["bias"]),
        "output_layer.weight": np.asarray(p["lm_head"]["kernel"]).T[:v],
        "output_layer.bias": np.asarray(p["lm_head"]["bias"])[:v],
    }
    for i in range(cfg.n_layers):
        lyr, tb = p[f"layer_{i}"], f"layers.{i}."
        sd[tb + "in_proj.weight"] = np.asarray(lyr["in_proj"]["kernel"]).T
        sd[tb + "conv1d.weight"] = np.asarray(lyr["conv_w"]).T[:, None, :]
        sd[tb + "conv1d.bias"] = np.asarray(lyr["conv_b"])
        sd[tb + "dt_bias"] = np.asarray(lyr["dt_bias"])
        sd[tb + "A_log"] = np.asarray(lyr["A_log"])
        sd[tb + "D"] = np.asarray(lyr["D"])
        sd[tb + "norm.weight"] = np.asarray(lyr["norm_weight"])
        sd[tb + "out_proj.weight"] = np.asarray(lyr["out_proj"]["kernel"]).T
    return sd


# ---------------------------------------------------------------------------
# xLSTM stack (NX-AI xLSTMBlockStack layout, reference xlstm_model.py)
# ---------------------------------------------------------------------------

def _blockwise_from_headwise(w: np.ndarray) -> np.ndarray:
    """LinearHeadwiseExpand weight (nb, out, in) -> BlockwiseDense kernel
    (nb, in, out)."""
    return np.transpose(w, (0, 2, 1))


def _dense_from_headwise(w: np.ndarray, d: int) -> np.ndarray:
    """LinearHeadwiseExpand weight (H, dh, dh) -> full Dense kernel (d, d)
    with the per-head maps embedded block-diagonally (exact: the headwise op
    is x.reshape(H, dh) @ W_h.T per head)."""
    nh, dh, _ = w.shape
    assert nh * dh == d
    out = np.zeros((d, d), np.float32)
    for h in range(nh):
        out[h * dh : (h + 1) * dh, h * dh : (h + 1) * dh] = w[h].T
    return out


def _headwise_from_dense(kernel: np.ndarray, nh: int, atol: float) -> np.ndarray:
    """Inverse of _dense_from_headwise; raises if off-block mass exceeds atol
    (a from-scratch-trained full Dense is not representable head-wise)."""
    d = kernel.shape[0]
    dh = d // nh
    out = np.zeros((nh, dh, dh), np.float32)
    mask = np.ones((d, d), bool)
    for h in range(nh):
        sl = slice(h * dh, (h + 1) * dh)
        out[h] = np.asarray(kernel)[sl, sl].T
        mask[sl, sl] = False
    off = float(np.abs(np.asarray(kernel)[mask]).max(initial=0.0))
    if off > atol:
        raise ValueError(
            "sLSTM input-gate Dense is not block-diagonal "
            f"(max off-block |w| = {off:.3e} > {atol}); these weights cannot "
            "be represented in the NX-AI head-wise layout"
        )
    return out


def _import_mlstm_block(m: StateDictMapper, tb: str, cfg: XLSTMConfig) -> Dict:
    d = cfg.embedding_dim
    d_inner = int(cfg.mlstm_proj_factor * d)
    nb = d_inner // cfg.qkv_proj_blocksize
    bs = cfg.qkv_proj_blocksize
    nh, ks = cfg.num_heads, cfg.conv1d_kernel_size
    x = tb + "xlstm."
    conv_w = m.take(x + "conv1d.conv.weight", (d_inner, 1, ks))
    mlstm = {
        "up_proj": {"kernel": m.take(x + "proj_up.weight", (2 * d_inner, d)).T},
        "conv_w": conv_w[:, 0, :].T,
        "conv_b": m.take(x + "conv1d.conv.bias", (d_inner,)),
        "q": {"kernel": _blockwise_from_headwise(
            m.take(x + "q_proj.weight", (nb, bs, bs)))},
        "k": {"kernel": _blockwise_from_headwise(
            m.take(x + "k_proj.weight", (nb, bs, bs)))},
        "v": {"kernel": _blockwise_from_headwise(
            m.take(x + "v_proj.weight", (nb, bs, bs)))},
        "igate": {
            "kernel": m.take(x + "mlstm_cell.igate.weight", (nh, 3 * d_inner)).T,
            "bias": m.take(x + "mlstm_cell.igate.bias", (nh,)),
        },
        "fgate": {
            "kernel": m.take(x + "mlstm_cell.fgate.weight", (nh, 3 * d_inner)).T,
            "bias": m.take(x + "mlstm_cell.fgate.bias", (nh,)),
        },
        "outnorm_scale": m.take(x + "mlstm_cell.outnorm.weight", (d_inner,)),
        "learnable_skip": m.take(x + "learnable_skip", (d_inner,)),
        "down_proj": {"kernel": m.take(x + "proj_down.weight", (d, d_inner)).T},
    }
    return {
        "ln": {
            "scale": m.take(tb + "xlstm_norm.weight", (d,)),
            # NX-AI LayerNorm has no bias by default.
            "bias": _zeros_or(m.take_optional(tb + "xlstm_norm.bias", (d,)), d),
        },
        "mlstm": mlstm,
    }


def _zeros_or(v: Optional[np.ndarray], n: int) -> np.ndarray:
    return v if v is not None else np.zeros((n,), np.float32)


def _import_slstm_block(m: StateDictMapper, tb: str, cfg: XLSTMConfig) -> Dict:
    d = cfg.embedding_dim
    nh, ks = cfg.num_heads, cfg.conv1d_kernel_size
    dh = d // nh
    ff = int(cfg.slstm_ff_proj_factor * d)
    x = tb + "xlstm."
    conv_w = m.take(x + "conv1d.conv.weight", (d, 1, ks))
    # Assumed cell layout (see module docstring): recurrent kernel
    # (H, dh_in, 4, dh_out) with gate order i,f,z,o; bias (H, 4, dh).
    rk = m.take(x + "slstm_cell._recurrent_kernel_", (nh, dh, 4, dh))
    bias = m.take(x + "slstm_cell._bias_", (nh, 4, dh))
    slstm = {
        "conv_w": conv_w[:, 0, :].T,
        "conv_b": m.take(x + "conv1d.conv.bias", (d,)),
        "w_i": {"kernel": _dense_from_headwise(
            m.take(x + "igate.weight", (nh, dh, dh)), d)},
        "w_f": {"kernel": _dense_from_headwise(
            m.take(x + "fgate.weight", (nh, dh, dh)), d)},
        "w_z": {"kernel": _dense_from_headwise(
            m.take(x + "zgate.weight", (nh, dh, dh)), d)},
        "w_o": {"kernel": _dense_from_headwise(
            m.take(x + "ogate.weight", (nh, dh, dh)), d)},
        "r_kernel": np.transpose(rk, (2, 0, 1, 3)),  # -> (4, H, dh, dh)
        "bias": np.transpose(bias, (1, 0, 2)),  # -> (4, H, dh)
        "gn_scale": m.take(x + "group_norm.weight", (d,)),
    }
    up_b = m.take_optional(tb + "ffn.proj_up.bias", (ff,))
    down_b = m.take_optional(tb + "ffn.proj_down.bias", (d,))
    return {
        "ln": {
            "scale": m.take(tb + "xlstm_norm.weight", (d,)),
            "bias": _zeros_or(m.take_optional(tb + "xlstm_norm.bias", (d,)), d),
        },
        "ln_ffn": {
            "scale": m.take(tb + "ffn_norm.weight", (d,)),
            "bias": _zeros_or(m.take_optional(tb + "ffn_norm.bias", (d,)), d),
        },
        "slstm": slstm,
        "ffn": {
            "up": {
                "kernel": m.take(tb + "ffn.proj_up.weight", (ff, d)).T,
                "bias": _zeros_or(up_b, ff),
            },
            "down": {
                "kernel": m.take(tb + "ffn.proj_down.weight", (d, ff)).T,
                "bias": _zeros_or(down_b, d),
            },
        },
    }


def _import_stack(
    m: StateDictMapper, prefix: str, cfg: XLSTMConfig
) -> Dict[str, Any]:
    d = cfg.embedding_dim
    stack: Dict[str, Any] = {}
    for i in range(cfg.num_blocks):
        tb = f"{prefix}blocks.{i}."
        if i in cfg.slstm_at:
            stack[f"block_{i}"] = _import_slstm_block(m, tb, cfg)
        else:
            stack[f"block_{i}"] = _import_mlstm_block(m, tb, cfg)
    stack["post_norm"] = {
        "scale": m.take(prefix + "post_blocks_norm.weight", (d,)),
        "bias": _zeros_or(
            m.take_optional(prefix + "post_blocks_norm.bias", (d,)), d
        ),
    }
    return stack


def import_xlstm(
    sd: Dict[str, Any], cfg: Optional[XLSTMConfig] = None
) -> Dict[str, Any]:
    cfg = cfg or XLSTMConfig()
    m = StateDictMapper(sd)
    d, v = cfg.embedding_dim, cfg.vocab_size
    params: Dict[str, Any] = {
        "token_embedding": {
            "embedding": _pad_embedding(
                m.take("token_embedding.weight", (v, d)), cfg.padded_vocab
            )
        },
        "metadata_embedding": {
            "embedding": m.take(
                "metadata_embedding.weight", (cfg.metadata_vocab_size, d)
            )
        },
    }
    k, b = _pad_head(
        m.take("output_layer.weight", (v, d)),
        m.take("output_layer.bias", (v,)),
        cfg.padded_vocab,
    )
    params["lm_head"] = {"kernel": k, "bias": b}
    params["stack"] = _import_stack(m, "layers.", cfg)
    m.finish()
    return {"params": params}


def import_classifier(
    sd: Dict[str, Any], cfg: Optional[ClassifierConfig] = None
) -> Dict[str, Any]:
    """The reference Classifier defines an `output_layer` Linear it never
    calls (models/classifier/model.py:50,53-58); its weights are consumed and
    discarded here since XLSTMClassifier omits the dead head."""
    cfg = cfg or ClassifierConfig()
    m = StateDictMapper(sd)
    m.discard(lambda k: k.startswith("output_layer."))
    d, v = cfg.embedding_dim, cfg.vocab_size
    params: Dict[str, Any] = {
        "token_embedding": {
            "embedding": _pad_embedding(
                m.take("token_embedding.weight", (v, d)), cfg.padded_vocab
            )
        },
        "fc": {
            "kernel": m.take("fc.weight", (cfg.metadata_vocab_size, d)).T,
            "bias": m.take("fc.bias", (cfg.metadata_vocab_size,)),
        },
    }
    params["stack"] = _import_stack(m, "layers.", cfg)
    m.finish()
    return {"params": params}


def _export_stack(
    stack: Dict[str, Any], prefix: str, cfg: XLSTMConfig, atol: float
) -> Dict[str, np.ndarray]:
    d = cfg.embedding_dim
    nh, ks = cfg.num_heads, cfg.conv1d_kernel_size
    sd: Dict[str, np.ndarray] = {
        prefix + "post_blocks_norm.weight": np.asarray(
            stack["post_norm"]["scale"]
        ),
    }
    for i in range(cfg.num_blocks):
        blk, tb = stack[f"block_{i}"], f"{prefix}blocks.{i}."
        sd[tb + "xlstm_norm.weight"] = np.asarray(blk["ln"]["scale"])
        x = tb + "xlstm."
        if i in cfg.slstm_at:
            s = blk["slstm"]
            sd[x + "conv1d.conv.weight"] = np.asarray(s["conv_w"]).T[:, None, :]
            sd[x + "conv1d.conv.bias"] = np.asarray(s["conv_b"])
            for gate, name in (
                ("w_i", "igate"), ("w_f", "fgate"),
                ("w_z", "zgate"), ("w_o", "ogate"),
            ):
                sd[x + name + ".weight"] = _headwise_from_dense(
                    np.asarray(s[gate]["kernel"]), nh, atol
                )
            sd[x + "slstm_cell._recurrent_kernel_"] = np.transpose(
                np.asarray(s["r_kernel"]), (1, 2, 0, 3)
            )
            sd[x + "slstm_cell._bias_"] = np.transpose(
                np.asarray(s["bias"]), (1, 0, 2)
            )
            sd[x + "group_norm.weight"] = np.asarray(s["gn_scale"])
            sd[tb + "ffn_norm.weight"] = np.asarray(blk["ln_ffn"]["scale"])
            sd[tb + "ffn.proj_up.weight"] = np.asarray(
                blk["ffn"]["up"]["kernel"]
            ).T
            sd[tb + "ffn.proj_up.bias"] = np.asarray(blk["ffn"]["up"]["bias"])
            sd[tb + "ffn.proj_down.weight"] = np.asarray(
                blk["ffn"]["down"]["kernel"]
            ).T
            sd[tb + "ffn.proj_down.bias"] = np.asarray(
                blk["ffn"]["down"]["bias"]
            )
        else:
            ml = blk["mlstm"]
            sd[x + "proj_up.weight"] = np.asarray(ml["up_proj"]["kernel"]).T
            sd[x + "conv1d.conv.weight"] = np.asarray(ml["conv_w"]).T[:, None, :]
            sd[x + "conv1d.conv.bias"] = np.asarray(ml["conv_b"])
            for proj in ("q", "k", "v"):
                sd[x + f"{proj}_proj.weight"] = np.transpose(
                    np.asarray(ml[proj]["kernel"]), (0, 2, 1)
                )
            sd[x + "mlstm_cell.igate.weight"] = np.asarray(
                ml["igate"]["kernel"]
            ).T
            sd[x + "mlstm_cell.igate.bias"] = np.asarray(ml["igate"]["bias"])
            sd[x + "mlstm_cell.fgate.weight"] = np.asarray(
                ml["fgate"]["kernel"]
            ).T
            sd[x + "mlstm_cell.fgate.bias"] = np.asarray(ml["fgate"]["bias"])
            sd[x + "mlstm_cell.outnorm.weight"] = np.asarray(
                ml["outnorm_scale"]
            )
            sd[x + "learnable_skip"] = np.asarray(ml["learnable_skip"])
            sd[x + "proj_down.weight"] = np.asarray(ml["down_proj"]["kernel"]).T
    return sd


def export_xlstm(
    params: Dict[str, Any],
    cfg: Optional[XLSTMConfig] = None,
    atol: float = 0.0,
) -> Dict[str, np.ndarray]:
    """`atol` bounds the off-block mass tolerated when folding the full-Dense
    sLSTM input gates back into the head-wise layout (0.0 = exact only, i.e.
    weights that came from import_xlstm; from-scratch-trained gates raise)."""
    cfg = cfg or XLSTMConfig()
    p = params["params"]
    v = cfg.vocab_size
    sd = {
        "token_embedding.weight": np.asarray(p["token_embedding"]["embedding"])[:v],
        "metadata_embedding.weight": np.asarray(
            p["metadata_embedding"]["embedding"]
        ),
        "output_layer.weight": np.asarray(p["lm_head"]["kernel"]).T[:v],
        "output_layer.bias": np.asarray(p["lm_head"]["bias"])[:v],
    }
    sd.update(_export_stack(p["stack"], "layers.", cfg, atol))
    return sd


def export_classifier(
    params: Dict[str, Any],
    cfg: Optional[ClassifierConfig] = None,
    atol: float = 0.0,
) -> Dict[str, np.ndarray]:
    """Emits a zero `output_layer` for the reference Classifier's dead Linear
    so torch load_state_dict(strict=True) accepts the result."""
    cfg = cfg or ClassifierConfig()
    p = params["params"]
    d, v = cfg.embedding_dim, cfg.vocab_size
    sd = {
        "token_embedding.weight": np.asarray(p["token_embedding"]["embedding"])[:v],
        "fc.weight": np.asarray(p["fc"]["kernel"]).T,
        "fc.bias": np.asarray(p["fc"]["bias"]),
        "output_layer.weight": np.zeros((v, d), np.float32),
        "output_layer.bias": np.zeros((v,), np.float32),
    }
    sd.update(_export_stack(p["stack"], "layers.", cfg, atol))
    return sd


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------

_IMPORTERS = {
    "transformer": (import_transformer, TransformerConfig),
    "mamba": (import_mamba, MambaConfig),
    "xlstm": (import_xlstm, XLSTMConfig),
    "classifier": (import_classifier, ClassifierConfig),
}

_EXPORTERS = {
    "transformer": (export_transformer, TransformerConfig),
    "mamba": (export_mamba, MambaConfig),
    "xlstm": (export_xlstm, XLSTMConfig),
    "classifier": (export_classifier, ClassifierConfig),
}


def import_state_dict(
    model_type: str, sd: Dict[str, Any], cfg: Any = None
) -> Dict[str, Any]:
    """Torch state dict -> flax variables ({'params': ...}) for
    `model_type` in {transformer, mamba, xlstm, classifier}."""
    if model_type not in _IMPORTERS:
        raise ValueError(f"unknown model type '{model_type}'")
    fn, default_cfg = _IMPORTERS[model_type]
    return fn(sd, cfg or default_cfg())


def export_state_dict(
    model_type: str, params: Dict[str, Any], cfg: Any = None, **kw
) -> Dict[str, np.ndarray]:
    """Flax variables -> torch-loadable state dict (plain numpy arrays;
    pass through `torch.from_numpy` on the torch side)."""
    if model_type not in _EXPORTERS:
        raise ValueError(f"unknown model type '{model_type}'")
    fn, default_cfg = _EXPORTERS[model_type]
    return fn(params, cfg or default_cfg(), **kw)
