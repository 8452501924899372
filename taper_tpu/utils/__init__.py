"""Utilities: checkpointing, AOT export, timing."""

from taper_tpu.utils import aot, checkpoint

__all__ = ["aot", "checkpoint"]
