"""Checkpoint codec and torch-format interop."""

from . import checkpoint, torch_import  # noqa: F401
