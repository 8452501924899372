"""Utilities: checkpointing, timing."""

from taper_tpu.utils import checkpoint

__all__ = ["checkpoint"]
