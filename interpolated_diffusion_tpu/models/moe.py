"""Switch-style mixture-of-experts FFN with TPU-native dense dispatch.

Beyond the reference (dense-only models): an expert-parallel FFN for the
DiT block stacks, built the GShard/Switch way that XLA shards well —
no ragged gathers, no host-side routing. Dispatch and combine are one-hot
einsums over a fixed per-expert capacity, so every shape is static, the
FLOPs land on the MXU, and sharding the expert axis of the parameter stack
(parallel/ep.py) makes GSPMD insert the all-to-alls between the data and
expert layouts automatically.

Routing: top-1 (Switch Transformer, arXiv 2101.03961) with the standard
load-balancing auxiliary loss aux = E * Σ_e f_e · p_e (fraction routed ×
mean router prob). Tokens beyond an expert's capacity C = ceil(tokens/E ·
capacity_factor) are dropped (identity residual passes them through —
combine weights are zero), matching Switch semantics.
"""
from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class SwitchFFN(nn.Module):
    """Top-1 routed expert FFN: [.., L, dim] -> [.., L, dim] + aux loss."""

    dim: int
    ffn_dim: int
    n_experts: int
    capacity_factor: float = 1.25
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        orig_shape = x.shape
        D, E = self.dim, self.n_experts
        x2 = x.reshape(-1, D)                                   # [N, D]
        N = x2.shape[0]
        C = max(1, math.ceil(N / E * self.capacity_factor))

        # router in f32 — tiny, and argmax ties/probs shouldn't quantize
        logits = nn.Dense(E, dtype=jnp.float32, name="router")(
            x2.astype(jnp.float32))                             # [N, E]
        probs = nn.softmax(logits, axis=-1)
        expert = jnp.argmax(probs, axis=-1)                     # [N]
        gate = jnp.take_along_axis(probs, expert[:, None], axis=1)[:, 0]

        onehot = nn.one_hot(expert, E, dtype=jnp.float32)       # [N, E]
        # position of each token inside its expert's buffer
        pos = jnp.einsum("ne,ne->n", jnp.cumsum(onehot, axis=0) - 1.0,
                         onehot).astype(jnp.int32)
        keep = pos < C                                          # capacity drop
        # dispatch/combine tensors [N, E, C] (GShard dense formulation)
        pos_oh = nn.one_hot(pos, C, dtype=jnp.float32)          # [N, C]
        dispatch = onehot[:, :, None] * pos_oh[:, None, :] * keep[:, None, None]
        combine = dispatch * gate[:, None, None]

        # stacked expert parameters [E, ...] — the EP sharding axis
        k_in = self.param(
            "ffn_in",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (E, D, self.ffn_dim), jnp.float32)
        b_in = self.param("ffn_in_bias", nn.initializers.zeros,
                          (E, self.ffn_dim), jnp.float32)
        k_out = self.param(
            "ffn_out",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (E, self.ffn_dim, D), jnp.float32)

        xe = jnp.einsum("nd,nec->ecd", x2.astype(jnp.float32), dispatch)
        h = jnp.einsum("ecd,edf->ecf", xe, k_in) + b_in[:, None, :]
        h = nn.gelu(h.astype(self.dtype), approximate=True).astype(jnp.float32)
        ye = jnp.einsum("ecf,efd->ecd", h, k_out)               # [E, C, D]
        y = jnp.einsum("ecd,nec->nd", ye, combine)              # [N, D]

        # Switch load-balancing loss: E * Σ_e (fraction routed)·(mean prob)
        frac = onehot.mean(axis=0)
        mean_p = probs.mean(axis=0)
        aux = E * jnp.sum(frac * mean_p)
        return y.reshape(orig_shape).astype(x.dtype), aux
