"""Multi-host sharded checkpoints (orbax) with the same meta-dict contract.

The single-host format (utils/checkpoint.py) is a msgpack directory; for
multi-host meshes each process must write its own array shards — orbax
handles that. Same directory-per-step layout, same (step, payload) API, plus
meta.json written by process 0 so `read_meta`/`latest_checkpoint` work on
both formats (SURVEY.md §5.8: the reference's single-file torch.save becomes
a directory of shards with identical meta semantics).
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax


def save_checkpoint_sharded(
    path: str,
    params: Any,
    opt_state: Optional[Any] = None,
    step: int = 0,
    ema_params: Optional[Any] = None,
    meta: Optional[Dict] = None,
) -> None:
    import orbax.checkpoint as ocp

    payload = {"params": params}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    if ema_params is not None:
        payload["ema"] = ema_params
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.join(os.path.abspath(path), "arrays"), payload)
    if jax.process_index() == 0:
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(
                {"step": int(step), "meta": meta or {}, "format": "orbax",
                 "has_opt_state": opt_state is not None,
                 "has_ema": ema_params is not None},
                f, indent=2,
            )


def load_checkpoint_sharded(
    path: str,
    params_template: Any,
    opt_state_template: Optional[Any] = None,
    ema_template: Optional[Any] = None,
    param_shardings: Optional[Any] = None,
) -> Tuple[int, Dict[str, Any]]:
    """Restore a sharded checkpoint.

    `param_shardings`: optional pytree of NamedSharding matching
    params_template — each param materializes DIRECTLY into its target
    sharding (TP/PP/EP layouts from parallel/{tp,pp,ep}.py), so no device
    holds the full tree at any point; without it arrays restore
    default-placed and must be device_put afterwards (full-size host copy)."""
    import orbax.checkpoint as ocp

    with open(os.path.join(path, "meta.json")) as f:
        header = json.load(f)
    tmpl = {"params": params_template}
    if header.get("has_opt_state") and opt_state_template is not None:
        tmpl["opt_state"] = opt_state_template
    if header.get("has_ema"):
        tmpl["ema"] = ema_template if ema_template is not None else params_template
    ckptr = ocp.PyTreeCheckpointer()
    kwargs = {}
    if param_shardings is not None:
        def rarg(sh):
            return ocp.ArrayRestoreArgs(sharding=sh)

        restore_args = {"params": jax.tree_util.tree_map(rarg, param_shardings)}
        for k in tmpl:
            if k != "params":
                restore_args[k] = jax.tree_util.tree_map(
                    lambda _: ocp.RestoreArgs(), tmpl[k])
        kwargs["restore_args"] = restore_args
    restored = ckptr.restore(os.path.join(os.path.abspath(path), "arrays"),
                             item=tmpl, **kwargs)
    restored["meta"] = header["meta"]
    return int(header["step"]), restored
