"""Run provenance: run_config.json with argv, env, devices, git state.

Parity with reference src/utils/run_config.py (:59-90): argv, args,
timestamp, library versions, device names, git commit + dirty bit, dataset
meta — written next to every run so results stay attributable.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from typing import Any, Dict, Optional


def _git_state(repo_dir: Optional[str] = None) -> Dict[str, Any]:
    repo_dir = repo_dir or os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    try:
        commit = subprocess.run(
            ["git", "rev-parse", "HEAD"], cwd=repo_dir,
            capture_output=True, text=True, timeout=5,
        ).stdout.strip()
        dirty = bool(subprocess.run(
            ["git", "status", "--porcelain"], cwd=repo_dir,
            capture_output=True, text=True, timeout=5,
        ).stdout.strip())
        return {"commit": commit, "dirty": dirty}
    except Exception:
        return {"commit": None, "dirty": None}


def write_run_config(out_dir: str, args: Any, extra: Optional[Dict] = None) -> str:
    import jax

    os.makedirs(out_dir, exist_ok=True)
    payload = {
        "argv": sys.argv,
        "args": vars(args) if hasattr(args, "__dict__") else dict(args),
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "jax_version": jax.__version__,
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "git": _git_state(),
    }
    if extra:
        payload.update(extra)
    path = os.path.join(out_dir, "run_config.json")
    with open(path, "w") as f:
        json.dump(payload, f, indent=2, default=str)
    return path
