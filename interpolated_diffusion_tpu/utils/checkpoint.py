"""Checkpoint save/load with a meta-dict config channel.

Parity with reference src/utils/checkpoint.py (:6 save, :29 load): the
payload carries {params, opt_state?, step, ema?, meta}; `meta` is the de-facto
config system — samplers and downstream trainers reconstruct models from it
(reference §5.4/§5.6 semantics).

Format: a directory with `meta.json` (JSON: step + meta + tree structure) and
msgpack-serialized pytrees (flax.serialization). Single-host here;
multi-host sharded saves go through parallel/checkpoint (orbax) later.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    path: str,
    params: Any,
    opt_state: Optional[Any] = None,
    step: int = 0,
    ema_params: Optional[Any] = None,
    meta: Optional[Dict] = None,
) -> None:
    """Write a checkpoint directory at `path` (created if needed).

    Atomicity contract (process-crash / reader-race scope — NOT power-loss
    durability; no fsync is issued, so an OS crash can leave truncated
    files even when meta.json exists): everything is staged in a sibling
    temp dir (whose name never matches the `ckpt_` prefix that
    `latest_checkpoint` scans) and renamed into place with os.replace.
    Overwriting an existing `path` needs two renames (path→.prev-<name>,
    stage→path); a kill inside that window leaves `path` briefly absent,
    but the last complete checkpoint survives as `.prev-<name>` and both
    `save_checkpoint` and `latest_checkpoint` restore it on their next
    call (`_recover_interrupted`). Stale `.tmp-*`/`.prev-*` siblings for
    this checkpoint name are swept at save time, so crashed saves don't
    accumulate disk or break later saves via PID reuse. meta.json is
    written last inside the stage so its presence implies the arrays are
    fully serialized (within the process-crash scope above).
    """
    import shutil

    parent = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(parent, exist_ok=True)
    _recover_interrupted(parent)
    base = os.path.basename(path)
    # sweep stale staging/backup dirs for THIS name (prior crashed saves,
    # possibly from a different PID) so os.replace below can't hit ENOTEMPTY
    for name in os.listdir(parent):
        if name.startswith(f".tmp-{base}-") or name == f".prev-{base}":
            shutil.rmtree(os.path.join(parent, name), ignore_errors=True)
    stage = os.path.join(parent, f".tmp-{base}-{os.getpid()}")
    os.makedirs(stage)
    with open(os.path.join(stage, "params.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(_to_host(params)))
    if opt_state is not None:
        with open(os.path.join(stage, "opt_state.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(_to_host(opt_state)))
    if ema_params is not None:
        with open(os.path.join(stage, "ema.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(_to_host(ema_params)))
    with open(os.path.join(stage, "meta.json"), "w") as f:
        json.dump(
            {
                "step": int(step),
                "meta": meta or {},
                "has_opt_state": opt_state is not None,
                "has_ema": ema_params is not None,
            },
            f,
            indent=2,
        )
    if os.path.isdir(path):
        old = os.path.join(parent, f".prev-{base}")
        os.replace(path, old)
        os.replace(stage, path)
        shutil.rmtree(old, ignore_errors=True)
    else:
        os.replace(stage, path)


def _recover_interrupted(parent: str) -> None:
    """Restore checkpoints stranded by a kill between save_checkpoint's two
    overwrite renames: if `.prev-<name>` exists without `<name>`, it IS the
    last complete checkpoint — rename it back. Leftover `.prev-` dirs whose
    target exists are just unswept backups and are removed."""
    import shutil

    try:
        names = os.listdir(parent)
    except OSError:
        return
    for name in names:
        if not name.startswith(".prev-"):
            continue
        src = os.path.join(parent, name)
        target = os.path.join(parent, name[len(".prev-"):])
        if not os.path.exists(target):
            os.replace(src, target)
        else:
            shutil.rmtree(src, ignore_errors=True)


def load_checkpoint(
    path: str,
    params_template: Any,
    opt_state_template: Optional[Any] = None,
    ema_template: Optional[Any] = None,
) -> Tuple[int, Dict[str, Any]]:
    """Load from a checkpoint directory.

    Templates supply the pytree structure (msgpack stores leaves only).
    Returns (step, payload) where payload has params / opt_state / ema / meta.
    """
    with open(os.path.join(path, "meta.json")) as f:
        header = json.load(f)
    if header.get("format") == "orbax":
        # trained with sharded/async saves — route through the orbax reader
        # so samplers/diagnostics work on either format transparently
        from .checkpoint_sharded import load_checkpoint_sharded

        return load_checkpoint_sharded(path, params_template,
                                       opt_state_template, ema_template)
    payload: Dict[str, Any] = {"meta": header["meta"]}
    with open(os.path.join(path, "params.msgpack"), "rb") as f:
        payload["params"] = serialization.from_bytes(params_template, f.read())
    if header.get("has_opt_state") and opt_state_template is not None:
        with open(os.path.join(path, "opt_state.msgpack"), "rb") as f:
            payload["opt_state"] = serialization.from_bytes(opt_state_template, f.read())
    if header.get("has_ema"):
        tmpl = ema_template if ema_template is not None else params_template
        with open(os.path.join(path, "ema.msgpack"), "rb") as f:
            payload["ema"] = serialization.from_bytes(tmpl, f.read())
    return int(header["step"]), payload


def read_meta(path: str) -> Tuple[int, Dict]:
    """Read just (step, meta) without deserializing arrays."""
    with open(os.path.join(path, "meta.json")) as f:
        header = json.load(f)
    return int(header["step"]), header["meta"]


def latest_checkpoint(ckpt_root: str, prefix: str = "ckpt_") -> Optional[str]:
    """Find the highest-step `ckpt_<step>` directory under ckpt_root."""
    if not os.path.isdir(ckpt_root):
        return None
    _recover_interrupted(ckpt_root)
    best, best_step = None, -1
    for name in os.listdir(ckpt_root):
        if not name.startswith(prefix):
            continue
        try:
            step = int(name[len(prefix):])
        except ValueError:
            continue
        if step > best_step and os.path.exists(os.path.join(ckpt_root, name, "meta.json")):
            best, best_step = os.path.join(ckpt_root, name), step
    return best
