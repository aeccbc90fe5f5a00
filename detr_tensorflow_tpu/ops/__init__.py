"""Device-side math: box geometry, Hungarian matching, set losses, kernels."""

from . import boxes  # noqa: F401
