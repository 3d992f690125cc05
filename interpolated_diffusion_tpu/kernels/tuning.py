"""Opt-in autotuned kernel block sizes.

scripts/autotune_attention.py sweeps Pallas attention block configs on the
real TPU and writes docs/attn_autotune.json. Setting

    ID_TPU_ATTN_TUNE=/path/to/attn_autotune.json

makes the long-sequence flash dispatch in WanAttention use the measured
winners instead of the built-in defaults. Without the env var this module is
inert — runs stay reproducible from flags alone, and tuned block sizes are
trace-time constants either way (static shapes; nothing dynamic reaches XLA).
"""
from __future__ import annotations

import json
import os
from functools import lru_cache
from typing import Optional, Tuple

_ENV = "ID_TPU_ATTN_TUNE"


@lru_cache(maxsize=1)
def _load(path: str) -> dict:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _best(kernel: str, prefer: str) -> Optional[Tuple[int, int]]:
    path = os.environ.get(_ENV)
    if not path:
        return None
    cfg = _load(path).get(kernel, {})
    # No cross-fallback: a best_fwd winner may have an UNCOMPILABLE backward
    # (the sweep retries forward-only on grad failure), so a training-time
    # prefer="best_grad" lookup must fall back to the built-in defaults, not
    # to the forward winner.
    tag = cfg.get(prefer)
    if not tag:
        return None
    try:
        m, n = (int(t) for t in tag.split("x"))
        return m, n
    except ValueError:
        return None


def flash_blocks(default_m: int = 512, default_n: int = 1024,
                 prefer: str = "best_grad") -> Tuple[int, int]:
    """(block_m, block_n) for the dense flash kernel: tuned or defaults.

    `prefer` picks the fwd+bwd winner by default (training dominates cost);
    falls back to the forward winner, then to the built-in defaults.
    """
    return _best("flash", prefer) or (default_m, default_n)


def small_attn_policy(default: str = "fused") -> str:
    """Small-L attention packing policy ('fused' | 'full' | 'group' | 'none').

    One lookup consulted by EVERY small-L attention call site
    (models/transformer.py dispatch). Resolution order: the tuned registry's
    "small_attn" winner (written by scripts/bench_sweep.py --write_registry),
    then the ID_TPU_SMALL_ATTN env override, then the built-in default —
    'fused' = the round-4 Pallas batch-packed block-diagonal kernel at
    256 < H·L (kernels/small_mha.small_mha_packed; VMEM-resident logits),
    falling back to 'full' behavior at H·L ≤ 256 where the XLA full pack
    already wins (docs/RESULTS.md "Small-L attention")."""
    path = os.environ.get(_ENV)
    if path:
        best = _load(path).get("small_attn", {}).get("best")
        if best in ("fused", "full", "group", "none", "block"):
            return best
    return os.environ.get("ID_TPU_SMALL_ATTN", default)


def fused_group_b(L: int, default_rows: int = 512) -> int:
    """Batch-pack group size G for small_mha_packed: G·L row target.

    Row-target resolution: tuned registry key small_attn.fused_rows, then
    the ID_TPU_FUSED_ROWS env override (scripts/bench_sweep.py sweeps it),
    then the built-in default; G is clamped to [1, 64]."""
    rows = default_rows
    path = os.environ.get(_ENV)
    got = _load(path).get("small_attn", {}).get("fused_rows") if path else None
    if isinstance(got, int) and got > 0:
        rows = got
    else:
        env = os.environ.get("ID_TPU_FUSED_ROWS")
        if env and env.isdigit():
            rows = int(env)
    return max(1, min(64, rows // max(1, L)))


def sla_blocks(default: int = 256, quant: str = "none",
               prefer: str = "best_grad", L: Optional[int] = None) -> int:
    """Square (block_q = block_k) size for the block-sparse SLA kernels:
    tuned winner from the 'sla' (bf16) or 'sage_sla' (int8) sweep, else the
    default. Consulted by WanDiT's attn_mode dispatch so ALL tuned kernels —
    not just flash — read the registry (VERDICT round-3 item 8).

    Unlike flash block sizes (exact at any config), the SLA block size sets
    the top-k block-map GRANULARITY — different block = different attended
    blocks = different outputs. The tuned value therefore only applies when
    the caller's sequence length L keeps the block map non-degenerate at the
    tuned size (>= 8 key blocks per row, the regime the 33k sweep measured);
    short-L callers keep their configured default."""
    kern = "sage_sla" if quant == "int8" else "sla"
    got = _best(kern, prefer)
    if not got:
        return default
    blk = got[0]
    if L is not None and L < 8 * blk:
        return default
    return blk
