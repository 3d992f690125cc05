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

    The write is atomic at the directory level: everything is staged in a
    sibling temp dir (whose name never matches the `ckpt_` prefix that
    `latest_checkpoint` scans) and renamed into place in one os.replace.
    Readers racing a save — the watchdog resuming, a sampler picking up the
    latest ckpt mid-training — therefore see either the previous complete
    checkpoint or the new complete one, never a truncated params.msgpack.
    meta.json is written last inside the stage so its presence implies the
    arrays are fully serialized.
    """
    import shutil

    parent = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(parent, exist_ok=True)
    stage = os.path.join(parent, f".tmp-{os.path.basename(path)}-{os.getpid()}")
    if os.path.isdir(stage):
        shutil.rmtree(stage)
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
        old = stage + ".old"
        os.replace(path, old)
        os.replace(stage, path)
        shutil.rmtree(old)
    else:
        os.replace(stage, path)


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
