from .augment import augment
from .dataset import BatchIterator, TokenDataset, make_loaders, split_dataset
from .metadata import build_tokenization, load_band_vectors
from .preprocess import preprocess_midi_files

__all__ = [
    "augment",
    "BatchIterator",
    "TokenDataset",
    "make_loaders",
    "split_dataset",
    "build_tokenization",
    "load_band_vectors",
    "preprocess_midi_files",
]
