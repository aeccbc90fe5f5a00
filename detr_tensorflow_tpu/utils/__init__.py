"""Utilities: profiling/tracing, timing harness, pytree helpers."""

from .profiling import trace, Timer, benchmark_fn  # noqa: F401
from .trees import tree_size, tree_bytes, print_tree_summary  # noqa: F401
