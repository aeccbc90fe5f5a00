"""Pallas TPU kernels for the hot ops."""

from . import flash_attention  # noqa: F401
