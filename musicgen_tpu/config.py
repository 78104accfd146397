"""Frozen configuration tree for the TPU-native symbolic-music framework.

Replaces the reference's YAML->SimpleNamespace singletons
(reference: configs/common/__init__.py:7-58, configs/common/config.yaml:1-27)
with pure frozen dataclasses: no import-time file I/O, no global mutation.

The vocabulary layout is derived exactly as the reference does
(configs/common/__init__.py:31-58):

    vocab_size = pitch*channel + dyn + length + time + tempo = 17,914
    start_idx  = {pitch: 0, dyn: 16512, length: 16640, time: 17152, tempo: 17664}
"""
from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Mapping, Tuple


@dataclasses.dataclass(frozen=True)
class Discretization:
    """Event-field bin counts (reference: configs/common/config.yaml:1-7)."""

    pitch: int = 128
    dyn: int = 128
    length: int = 512
    time: int = 512
    channel: int = 129  # 128 instruments + 1 drum channel
    tempo: int = 250


@dataclasses.dataclass(frozen=True)
class VocabLayout:
    """Derived token-id layout over the 17,914-entry event vocabulary."""

    disc: Discretization = Discretization()

    @property
    def pitch_start(self) -> int:
        return 0

    @property
    def dyn_start(self) -> int:
        return self.disc.pitch * self.disc.channel

    @property
    def length_start(self) -> int:
        return self.dyn_start + self.disc.dyn

    @property
    def time_start(self) -> int:
        return self.length_start + self.disc.length

    @property
    def tempo_start(self) -> int:
        return self.time_start + self.disc.time

    @property
    def vocab_size(self) -> int:
        return self.tempo_start + self.disc.tempo

    @property
    def start_idx(self) -> Mapping[str, int]:
        return {
            "pitch": self.pitch_start,
            "dyn": self.dyn_start,
            "length": self.length_start,
            "time": self.time_start,
            "tempo": self.tempo_start,
        }

    @property
    def field_boundaries(self) -> Tuple[int, int, int, int]:
        """Bucketize boundaries used by the grammar filter.

        Matches reference train.py:117-121: [dyn-1, length-1, time-1, tempo-1].
        """
        return (
            self.dyn_start - 1,
            self.length_start - 1,
            self.time_start - 1,
            self.tempo_start - 1,
        )

    def padded_vocab_size(self, multiple: int = 128) -> int:
        """Round the vocab up for MXU-friendly tiling (17914 -> 17920)."""
        v = self.vocab_size
        return ((v + multiple - 1) // multiple) * multiple


# The canonical layout used everywhere.
VOCAB = VocabLayout()
VOCAB_SIZE = VOCAB.vocab_size  # 17914
assert VOCAB_SIZE == 17914

# Metadata vocabulary (composer/band + genres + decade tokens).
# The reference loads tokenization.json at import time
# (configs/common/__init__.py:21-28); we default to the canonical size and let
# callers override from an actual tokenization.json via load_metadata_vocab().
DEFAULT_METADATA_VOCAB_SIZE = 568
NUM_META_TOKENS = 6  # [band, genre x4 (padded), decade]
NUM_META = NUM_META_TOKENS


def load_metadata_vocab(tokenization_path: str | Path) -> int:
    with open(tokenization_path, "r") as f:
        return int(json.load(f)["VOCAB_SIZE"])


@dataclasses.dataclass(frozen=True)
class Resolution:
    """Beat-grid quantization (reference: configs/common/config.yaml:9-10)."""

    bar_res: int = 64  # ticks per beat


@dataclasses.dataclass(frozen=True)
class TrainValues:
    """Training hyperparameters (reference: configs/common/config.yaml:12-27)."""

    block_len: int = 2048
    dropout: float = 0.01
    epochs: int = 10000
    eval_interval: int = 10
    save_interval: int = 10
    learning_rate: float = 5e-5
    eval_iters: int = 200
    test_ratio: float = 0.2
    batch_size: int = 2
    augmentation: bool = False
    end_of_seq: bool = False
    start_of_seq: bool = False


# All models pad their vocab-sized matrices (embeddings, lm_head) to a
# multiple of this so (a) the MXU tiles them efficiently and (b) tensor
# parallelism can split the vocab dim evenly. Logits are sliced back to the
# true vocab, so the padding is invisible to losses and sampling.
VOCAB_PAD_MULTIPLE = 128


def padded_vocab(vocab_size: int, multiple: int = VOCAB_PAD_MULTIPLE) -> int:
    return ((vocab_size + multiple - 1) // multiple) * multiple


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    """Reference: configs/transformer/config.yaml:1-5."""

    n_embd: int = 1024
    n_heads: int = 8
    n_layer: int = 8
    block_len: int = 2048
    dropout: float = 0.01
    vocab_size: int = VOCAB_SIZE
    metadata_vocab_size: int = DEFAULT_METADATA_VOCAB_SIZE
    vocab_pad_multiple: int = VOCAB_PAD_MULTIPLE
    # 'auto' (flash on accelerators, xla on CPU), 'xla', 'flash' (fused
    # Pallas fwd + custom-VJP bwd, 3.7x XLA at training shapes), or
    # 'torch_exact' (bit-parity mode for the cross-framework harness).
    attention_impl: str = "auto"
    # Rematerialize each Block in the backward pass (jax.checkpoint).
    remat: bool = False

    @property
    def seq_len(self) -> int:  # meta prefix + tokens
        return self.block_len + NUM_META_TOKENS

    @property
    def padded_vocab(self) -> int:
        return padded_vocab(self.vocab_size, self.vocab_pad_multiple)


@dataclasses.dataclass(frozen=True)
class MambaConfig:
    """Reference: models/mamba/mamba.py:9-25 (hard-coded values).

    d_inner = expand*d_model = 2048; nheads = d_inner//headdim = 32.
    """

    d_model: int = 1024
    n_layers: int = 10
    d_state: int = 64
    d_conv: int = 4
    expand: int = 2
    headdim: int = 64
    ngroups: int = 1
    chunk_size: int = 256
    vocab_size: int = VOCAB_SIZE
    metadata_vocab_size: int = DEFAULT_METADATA_VOCAB_SIZE
    vocab_pad_multiple: int = VOCAB_PAD_MULTIPLE
    # 'auto' (pallas on accelerators, xla on CPU), 'xla' (differentiable),
    # or 'pallas' (fused TPU kernel, forward-only — used by prefill).
    ssd_impl: str = "auto"
    # Reference quirk (models/mamba/mamba.py:32-33): layers are stacked with
    # NO inter-layer residual connections. Keep False for fidelity.
    residual: bool = False
    # Rematerialize each mixer in the backward pass (jax.checkpoint): trades
    # ~1 extra forward of FLOPs for O(n_layers) less activation HBM.
    remat: bool = False

    @property
    def d_inner(self) -> int:
        return self.expand * self.d_model

    @property
    def nheads(self) -> int:
        return self.d_inner // self.headdim

    @property
    def conv_dim(self) -> int:
        return self.d_inner + 2 * self.ngroups * self.d_state

    @property
    def padded_vocab(self) -> int:
        return padded_vocab(self.vocab_size, self.vocab_pad_multiple)


@dataclasses.dataclass(frozen=True)
class XLSTMConfig:
    """Reference: models/xlstm/xlstm_model.py:17-42 (generator, dim 1024) and
    models/classifier/model.py:18-42 (classifier, dim 512)."""

    embedding_dim: int = 1024
    num_blocks: int = 11
    slstm_at: Tuple[int, ...] = (1, 4, 7, 10)
    num_heads: int = 4
    conv1d_kernel_size: int = 4
    qkv_proj_blocksize: int = 4
    mlstm_proj_factor: float = 2.0
    slstm_ff_proj_factor: float = 1.3
    context_length: int = 2048 + NUM_META_TOKENS
    vocab_size: int = VOCAB_SIZE
    metadata_vocab_size: int = DEFAULT_METADATA_VOCAB_SIZE
    vocab_pad_multiple: int = VOCAB_PAD_MULTIPLE
    # 'xla' (default — XLA's scan already batches the B*H recurrences onto
    # the MXU and edges out the batched Pallas kernel, 26.8 vs 31.2 ms at
    # the generator shape with on-device-reduced timing), 'pallas'
    # (forward-only batched kernel, kept as opt-in infrastructure), or
    # 'auto' (currently = xla).
    slstm_impl: str = "xla"
    # Rematerialize each block in the backward pass (jax.checkpoint).
    remat: bool = False

    @property
    def padded_vocab(self) -> int:
        return padded_vocab(self.vocab_size, self.vocab_pad_multiple)


@dataclasses.dataclass(frozen=True)
class ClassifierConfig:
    """Composer classifier = xLSTM stack at dim 512, no metadata prefix."""

    embedding_dim: int = 512
    num_blocks: int = 11
    slstm_at: Tuple[int, ...] = (1, 4, 7, 10)
    num_heads: int = 4
    conv1d_kernel_size: int = 4
    qkv_proj_blocksize: int = 4
    mlstm_proj_factor: float = 2.0
    slstm_ff_proj_factor: float = 1.3
    context_length: int = 2048
    vocab_size: int = VOCAB_SIZE
    metadata_vocab_size: int = DEFAULT_METADATA_VOCAB_SIZE
    vocab_pad_multiple: int = VOCAB_PAD_MULTIPLE

    @property
    def padded_vocab(self) -> int:
        return padded_vocab(self.vocab_size, self.vocab_pad_multiple)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh specification for pjit/shard_map parallelism.

    The reference's only strategy is DDP data parallelism over NCCL
    (train_parallel.py:143-151); here `data` is the equivalent axis and
    `model` optionally shards the vocab-sized embedding/lm_head (TP).
    """

    data: int = -1  # -1 = all devices
    model: int = 1

    def axis_sizes(self, n_devices: int) -> Tuple[int, int]:
        model = max(1, self.model)
        data = self.data if self.data > 0 else n_devices // model
        return data, model


@dataclasses.dataclass(frozen=True)
class Paths:
    """Reference: configs/paths/config.yaml:1-6 — but relative by default."""

    midi_dataset: str = "data/midi"
    np_dataset: str = "data/np"
    tokenizations: str = "data/tokenization.json"
    metadata: str = "data/metadata.json"
    pretrained: str = "checkpoints"
    logs: str = "logs"


@dataclasses.dataclass(frozen=True)
class Config:
    disc: Discretization = Discretization()
    resolution: Resolution = Resolution()
    values: TrainValues = TrainValues()
    transformer: TransformerConfig = TransformerConfig()
    mamba: MambaConfig = MambaConfig()
    xlstm: XLSTMConfig = XLSTMConfig()
    classifier: ClassifierConfig = ClassifierConfig()
    mesh: MeshConfig = MeshConfig()
    paths: Paths = Paths()

    @property
    def vocab(self) -> VocabLayout:
        return VocabLayout(self.disc)


DEFAULT_CONFIG = Config()
