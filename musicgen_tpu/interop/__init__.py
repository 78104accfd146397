"""Torch checkpoint interop: import reference `.pth` state dicts into
musicgen_tpu param trees (and export back for torch-side evaluation)."""

from .torch_import import (  # noqa: F401
    export_state_dict,
    import_state_dict,
)
