"""Model factory (reference: train.py:52-67 new_model/load_model)."""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import Config, DEFAULT_CONFIG, NUM_META
from .mamba import MambaLM
from .transformer import TransformerLM
from .xlstm import XLSTMClassifier, XLSTMLM

KINDS = ("mamba", "xlstm", "transformer")


def new_model(kind: str, config: Config = DEFAULT_CONFIG, dtype=jnp.float32):
    if kind == "mamba":
        return MambaLM(config.mamba, dtype=dtype)
    if kind == "xlstm":
        return XLSTMLM(config.xlstm, dtype=dtype)
    if kind == "transformer":
        return TransformerLM(config.transformer, dtype=dtype)
    if kind == "classifier":
        return XLSTMClassifier(config.classifier, dtype=dtype)
    raise ValueError(f"unknown model kind {kind!r}; choose from {KINDS + ('classifier',)}")


def init_params(model, kind: str, seed: int = 0, block_len: int = 2048):
    rng = jax.random.PRNGKey(seed)
    tokens = jnp.zeros((1, min(block_len, 64)), jnp.int32)
    if kind == "classifier":
        return model.init(rng, tokens)
    meta = jnp.zeros((1, NUM_META), jnp.int32)
    return model.init(rng, tokens, meta)
