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


_ASYNC_CKPTR = None      # singleton: one background thread pool per process


def save_checkpoint_sharded(
    path: str,
    params: Any,
    opt_state: Optional[Any] = None,
    step: int = 0,
    ema_params: Optional[Any] = None,
    meta: Optional[Dict] = None,
    async_save: bool = False,
) -> None:
    """Write a sharded checkpoint; with async_save=True the device→host
    copies happen synchronously but serialization/IO run on a background
    thread, so training resumes immediately (the standard TPU pattern —
    checkpoint stalls otherwise idle the chip for seconds at Wan scale).
    A later save or `wait_for_async_saves()` joins the in-flight write;
    meta.json is written only after the arrays land, so readers never see a
    step whose arrays are still in flight."""
    import orbax.checkpoint as ocp

    payload = {"params": params}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    if ema_params is not None:
        payload["ema"] = ema_params

    def _finalize():
        if jax.process_index() == 0:
            with open(os.path.join(path, "meta.json"), "w") as f:
                json.dump(
                    {"step": int(step), "meta": meta or {}, "format": "orbax",
                     "has_opt_state": opt_state is not None,
                     "has_ema": ema_params is not None},
                    f, indent=2,
                )

    arrays_dir = os.path.join(os.path.abspath(path), "arrays")
    if async_save:
        global _ASYNC_CKPTR, _META_THREAD
        import threading

        if _ASYNC_CKPTR is None:
            _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
        wait_for_async_saves()                  # join any previous save
        _ASYNC_CKPTR.save(arrays_dir, payload)

        def _wait_then_meta():
            _ASYNC_CKPTR.wait_until_finished()
            _finalize()

        _META_THREAD = threading.Thread(target=_wait_then_meta, daemon=True)
        _META_THREAD.start()
        return
    ocp.PyTreeCheckpointer().save(arrays_dir, payload)
    _finalize()


_META_THREAD = None


def wait_for_async_saves() -> None:
    """Block until any in-flight async checkpoint (and its meta.json) lands.

    Call before process exit / final eval so the last checkpoint is durable.
    """
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()
    global _META_THREAD
    if _META_THREAD is not None:
        _META_THREAD.join()
        _META_THREAD = None


def ocp_restore_untyped(path: str) -> Dict[str, Any]:
    """Restore the raw saved pytree (no template, default placement)."""
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer().restore(
        os.path.join(os.path.abspath(path), "arrays"))


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
    if params_template is None:
        # structure discovery: orbax restores the saved tree as-is (the
        # msgpack format can't do this — it stores leaves only)
        restored = ocp_restore_untyped(path)
        restored["meta"] = header["meta"]
        return int(header["step"]), restored
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
