"""Expert-parallel sharding rules (the `expert` mesh axis).

Completes the framework's parallelism axes (DP mesh.py / TP tp.py /
ring-SP ring.py / PP pp.py): SwitchFFN's stacked expert parameters
[E, ...] shard their leading expert axis over a mesh axis, and because the
dispatch/combine einsums (models/moe.py) contract token×expert one-hots
against those stacked tensors, GSPMD lowers the layout change into the
all-to-all pair of classic expert parallelism — no manual collectives.

EP composes with DP out of the box (batch on `data`, experts on `expert`)
and with TP by splitting each expert's ffn feature dim on `model` as well
(pass tp_axis)."""
from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# SwitchFFN's stacked expert leaves: name -> (expert dim, feature split dim)
_EXPERT_LEAVES = {
    "ffn_in": (0, 2),       # [E, D, ffn]: experts on 0, TP column split on 2
    "ffn_in_bias": (0, 1),  # [E, ffn]
    "ffn_out": (0, 1),      # [E, ffn, D]: TP row split on 1
}


def ep_param_sharding(params: Any, mesh: Mesh, expert_axis: str = "expert",
                      tp_axis: Optional[str] = None) -> Any:
    """NamedSharding pytree: expert axes on `expert_axis`, everything else
    replicated (or feature-split on `tp_axis` when given). Apply to any
    params tree containing SwitchFFN submodules — non-expert leaves pass
    through replicated so the tree can be device_put in one call."""
    n_exp = mesh.shape[expert_axis]
    n_tp = mesh.shape[tp_axis] if tp_axis else 1

    def spec_for(path, leaf):
        names = [str(getattr(k, "key", k)) for k in path]
        leafname = names[-1]
        if leafname in _EXPERT_LEAVES and leaf.ndim >= 2:
            e_dim, f_dim = _EXPERT_LEAVES[leafname]
            spec = [None] * leaf.ndim
            if leaf.shape[e_dim] % n_exp == 0:
                spec[e_dim] = expert_axis
            if tp_axis and f_dim < leaf.ndim and leaf.shape[f_dim] % n_tp == 0:
                spec[f_dim] = tp_axis
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def apply_ep(params: Any, mesh: Mesh, expert_axis: str = "expert",
             tp_axis: Optional[str] = None) -> Any:
    """Device-put params according to the EP rules."""
    return jax.tree_util.tree_map(
        jax.device_put, params,
        ep_param_sharding(params, mesh, expert_axis, tp_axis))
