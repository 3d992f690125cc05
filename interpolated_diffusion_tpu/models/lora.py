"""LoRA: low-rank adapters as parameter-tree surgery.

Capability parity with reference src/models/lora.py (LoRALinear :10,
inject_lora :50, mark_only_lora_trainable :73).

TPU-native design: instead of wrapping modules, LoRA lives as a parallel
parameter tree {A, B} keyed by the dense-kernel paths it adapts. The merged
weight W' = W + (α/r)·A·B is computed functionally per step (`apply_lora`),
which keeps the base model untouched and composes with any module. Training
only the adapters = optax.masked over the LoRA tree (`lora_trainable_mask`).
"""
from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp


def _iter_kernels(params: Any, prefix: Tuple[str, ...] = ()):
    if isinstance(params, dict):
        for k, v in params.items():
            if k == "kernel" and hasattr(v, "ndim") and v.ndim == 2:
                yield prefix, v
            else:
                yield from _iter_kernels(v, prefix + (str(k),))


def init_lora(
    key: jax.Array,
    params: Any,
    rank: int,
    alpha: float = 16.0,
    filter_regex: str = r"(qkv|attn_out|ff1|ff2|q_proj|k_proj|v_proj|o_proj)",
) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Create a LoRA tree for every 2D dense kernel whose path matches.

    Returns {"path/as/string": {"A": [in, r], "B": [r, out]}}; B zero-init so
    the adapted model starts exactly at the base model.
    """
    pat = re.compile(filter_regex)
    lora: Dict[str, Dict[str, jnp.ndarray]] = {}
    for path, kernel in _iter_kernels(params):
        name = "/".join(path)
        if not pat.search(name):
            continue
        d_in, d_out = kernel.shape
        key, k_a = jax.random.split(key)
        lora[name] = {
            "A": jax.random.normal(k_a, (d_in, rank), dtype=jnp.float32) * (1.0 / rank),
            "B": jnp.zeros((rank, d_out), dtype=jnp.float32),
        }
    if not lora:
        raise ValueError(f"no kernels matched LoRA filter {filter_regex!r}")
    return lora


def apply_lora(params: Any, lora: Dict[str, Dict[str, jnp.ndarray]],
               rank: int, alpha: float = 16.0) -> Any:
    """Merged params: kernel += (α/r)·A·B at every adapted path."""
    scale = alpha / max(1, rank)

    def merge(path_params, prefix=()):
        if not isinstance(path_params, dict):
            return path_params
        out = {}
        for k, v in path_params.items():
            if k == "kernel" and "/".join(prefix) in lora:
                ab = lora["/".join(prefix)]
                delta = (ab["A"] @ ab["B"]) * scale
                out[k] = v + delta.astype(v.dtype)
            else:
                out[k] = merge(v, prefix + (str(k),)) if isinstance(v, dict) else v
        return out

    return merge(params)


def lora_param_names(lora: Dict) -> List[str]:
    return sorted(lora.keys())
