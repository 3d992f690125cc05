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


def archive_evidence(out_dir: str, files=("summary.json", "run_config.json"),
                     repo_dir: Optional[str] = None) -> Optional[str]:
    """Copy a run's summary + provenance into docs/results/<run>/ so quality
    claims stay re-derivable after runs/ is wiped (runs/ is gitignored; the
    round-3 review found every headline table existed only as prose).

    <run> = the out_dir path relative to runs/ with separators flattened
    (runs/d4rl_r3/samples_bestof16 → docs/results/d4rl_r3__samples_bestof16).
    Set ID_TPU_NO_EVIDENCE=1 to skip (throwaway/debug runs). Runs are also
    skipped automatically when they cannot be round evidence: pytest runs
    (PYTEST_CURRENT_TEST set) and out_dirs outside the repo's runs/ tree
    (e.g. /tmp scratch) — the round-4 review found 8-sample test runs
    polluting docs/results/. Set ID_TPU_FORCE_EVIDENCE=1 to override.
    Reference analogue: scripts/log_experiment.sh:1-40 (the lab notebook).
    """
    if os.environ.get("ID_TPU_NO_EVIDENCE"):
        return None
    import shutil

    repo_dir = repo_dir or os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    out_abs = os.path.abspath(out_dir)
    rel = os.path.relpath(out_abs, os.path.join(repo_dir, "runs"))
    if not os.environ.get("ID_TPU_FORCE_EVIDENCE"):
        if os.environ.get("PYTEST_CURRENT_TEST") or rel.startswith(".."):
            return None
    if rel.startswith(".."):
        rel = os.path.basename(out_abs)
    dest = os.path.join(repo_dir, "docs", "results", rel.replace(os.sep, "__"))
    os.makedirs(dest, exist_ok=True)
    copied = False
    for name in files:
        src = os.path.join(out_dir, name)
        if os.path.isfile(src):
            shutil.copyfile(src, os.path.join(dest, name))
            copied = True
    return dest if copied else None
