"""Device-side math: box geometry, Hungarian matching, set losses, kernels."""

from . import boxes  # noqa: F401
from . import losses  # noqa: F401
from . import matcher  # noqa: F401
