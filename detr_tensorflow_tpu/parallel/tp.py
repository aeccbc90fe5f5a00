"""Tensor parallelism for the DETR transformer.

Megatron-style sharding expressed purely through `jax.sharding`
annotations — no communication code. On a mesh with a ``model`` axis:

  * attention q/k/v projection kernels shard their *output* dim (heads
    split across chips; head_dim 32 divides evenly for model_dim 256 on
    2/4/8-way meshes) and out_proj shards its *input* dim;
  * FFN linear1 shards its output dim, linear2 its input dim —
    the classic column-then-row split, so each token needs exactly one
    all-reduce per block, which XLA/GSPMD inserts automatically from the
    annotations (over ICI on a real slice);
  * everything else (backbone, norms, embeddings, heads) is replicated.

The reference has no parallelism at all (SURVEY.md §2.6); TP is not
needed for a 41M-parameter model but the mesh/annotation plumbing here
is what larger variants (R101, higher-dim transformers) scale with, and
it composes with the data axis: ``make_mesh(axis_names=("data",
"model"), axis_sizes=(d, m))``.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_COL_SHARDED = ("linear1/kernel", "q_proj/kernel", "k_proj/kernel", "v_proj/kernel")
_ROW_SHARDED = ("linear2/kernel", "out_proj/kernel")
_COL_BIAS = ("linear1/bias", "q_proj/bias", "k_proj/bias", "v_proj/bias")


def _spec_for(path_str: str, ndim: int, model_axis: str) -> P:
    if ndim == 2:
        if any(k in path_str for k in _COL_SHARDED):
            return P(None, model_axis)
        if any(k in path_str for k in _ROW_SHARDED):
            return P(model_axis, None)
    if ndim == 1 and any(k in path_str for k in _COL_BIAS):
        return P(model_axis)
    return P()


def detr_param_shardings(
    params: Dict[str, Any], mesh: Mesh, model_axis: str = "model"
):
    """NamedSharding pytree for the parameters (transformer TP, rest
    replicated)."""

    def assign(path, leaf):
        path_str = "/".join(
            getattr(k, "key", getattr(k, "idx", str(k))) for k in path
        )
        if "transformer" in path_str:
            return NamedSharding(mesh, _spec_for(path_str, leaf.ndim, model_axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(assign, params)


def shard_params(params, mesh: Mesh, model_axis: str = "model"):
    """Place parameters on the mesh with TP shardings committed."""
    shardings = detr_param_shardings(params, mesh, model_axis)
    return jax.tree.map(jax.device_put, params, shardings)
