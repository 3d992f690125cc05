"""Tensor-parallel parameter sharding rules for the transformer stack.

Megatron-style column/row parallelism expressed purely as parameter
shardings: the QKV and FFN-in kernels split their output features over the
`model` axis, the attention-out and FFN-out kernels split their input
features, and XLA's SPMD partitioner inserts the reduce-scatter/all-reduce
collectives. No model-code changes needed — GSPMD propagates from the
parameter shardings through the einsums.
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# kernels whose OUTPUT features are split (column parallel).
# NOTE: the maze transformer's fused "qkv" Dense is deliberately NOT here —
# its packed 3·d_model output axis reshapes to (3, H, Dh) right after the
# matmul, and 3 is not divisible by the model axis, so GSPMD would insert an
# all-gather that negates the split. The WanDiT's separate q/k/v projections
# split cleanly on heads (Megatron style).
_COL_PARALLEL = ("ff1", "t_fc1", "lvl_fc1", "fc1",
                 "q_proj", "k_proj", "v_proj", "ffn_in")
# kernels whose INPUT features are split (row parallel)
_ROW_PARALLEL = ("attn_out", "ff2", "t_fc2", "lvl_fc2", "fc2",
                 "o_proj", "ffn_out")


def tp_param_sharding(params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for params under (data, model) mesh TP rules.

    Handles both unrolled layouts (kernel [in, out]) and scan-over-layers
    stacked layouts (kernel [n_layers, in, out], bias [n_layers, out]) —
    the leading layer axis stays replicated, feature axes split on `model`.
    """
    n_model = mesh.shape["model"]

    def spec_for(path, leaf) -> NamedSharding:
        names = [str(getattr(k, "key", k)) for k in path]
        owner = names[-2] if len(names) >= 2 else ""
        leafname = names[-1]
        if n_model > 1 and leafname == "kernel" and leaf.ndim in (2, 3):
            lead = (None,) * (leaf.ndim - 2)
            if owner in _COL_PARALLEL and leaf.shape[-1] % n_model == 0:
                return NamedSharding(mesh, P(*lead, None, "model"))
            if owner in _ROW_PARALLEL and leaf.shape[-2] % n_model == 0:
                return NamedSharding(mesh, P(*lead, "model", None))
        if n_model > 1 and leafname == "bias" and leaf.ndim in (1, 2):
            lead = (None,) * (leaf.ndim - 1)
            if owner in _COL_PARALLEL and leaf.shape[-1] % n_model == 0:
                return NamedSharding(mesh, P(*lead, "model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def apply_tp(params: Any, mesh: Mesh) -> Any:
    """Device-put params according to the TP rules."""
    shardings = tp_param_sharding(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
