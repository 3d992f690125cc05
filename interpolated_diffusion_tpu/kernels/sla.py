"""Sparse-Linear Attention (SLA): block map builder + flax module.

Capability parity with the reference SLA package (SLA/utils.py get_block_map
:55 — mean-pooled Q/K descriptors with the smooth-k trick, pooled QKᵀ scores,
per-row top-k LUT; SLA/core.py SparseLinearAttention :38 — block-sparse
branch + low-rank linear-attention branch through a zero-init projection).

TPU-native: the block map is plain jnp (reshape-mean + top_k — cheap outside
the kernel, as SURVEY.md §2.3 prescribes); the sparse branch dispatches to the
Pallas kernel; the linear branch is two einsums the MXU eats directly.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .block_sparse_attention import block_sparse_attention


def mean_pool_blocks(x: jnp.ndarray, block: int) -> jnp.ndarray:
    """[..., L, D] -> [..., ceil(L/block), D] block-mean (zero-padded tail
    divided by the true count, matching the reference compress_kernel)."""
    *lead, L, D = x.shape
    n_blocks = -(-L // block)
    pad = n_blocks * block - L
    xp = jnp.pad(x, [(0, 0)] * len(lead) + [(0, pad), (0, 0)])
    xb = xp.reshape(*lead, n_blocks, block, D)
    counts = jnp.clip(
        jnp.minimum(L - jnp.arange(n_blocks) * block, block), 1, block
    ).astype(jnp.float32)
    # f32 accumulation: summing up to `block` bf16 values in bf16 perturbs
    # the pooled descriptors enough to flip marginal top-k block selections
    return (xb.astype(jnp.float32).sum(axis=-2) / counts[..., :, None]).astype(x.dtype)


def get_block_map(
    q: jnp.ndarray,          # [BH, L, D]
    k: jnp.ndarray,
    topk_ratio: float,
    block_q: int = 256,
    block_k: int = 256,
) -> Tuple[jnp.ndarray, jnp.ndarray, int]:
    """Returns (sparse_map [BH, M, N] int8, lut [BH, M, topk] int32, topk)."""
    arg_k = k - k.mean(axis=-2, keepdims=True)  # smooth-k (SageAttention)
    pq = mean_pool_blocks(q, block_q)
    pk = mean_pool_blocks(arg_k, block_k)
    score = jnp.einsum("bmd,bnd->bmn", pq.astype(jnp.float32), pk.astype(jnp.float32))
    n_blocks = score.shape[-1]
    topk = max(1, min(n_blocks, int(topk_ratio * n_blocks)))
    _, lut = jax.lax.top_k(score, topk)
    sparse_map = jax.nn.one_hot(lut, n_blocks, dtype=jnp.int8).sum(axis=-2)
    return sparse_map, lut.astype(jnp.int32), topk


def _linear_attention(q, k, v, feature_map: str) -> jnp.ndarray:
    """Global low-rank branch: φ(q)(φ(k)ᵀv) / (φ(q)·Σφ(k)).

    Computed in the inputs' dtype (bf16 on TPU) with f32 accumulation in the
    contractions — matching the reference, which runs this branch in model
    dtype under autocast (SLA/core.py:104-114). Keeping the activations bf16
    also halves the AD-saved residuals at Wan scale (3 × [BH, L, D] per
    layer; f32 versions showed up as 2.7 GB/layer buffers in HBM dumps).
    """
    if feature_map == "softmax":
        fq, fk = jax.nn.softmax(q, axis=-1), jax.nn.softmax(k, axis=-1)
    elif feature_map == "elu":
        fq, fk = jax.nn.elu(q) + 1, jax.nn.elu(k) + 1
    elif feature_map == "relu":
        fq, fk = jax.nn.relu(q), jax.nn.relu(k)
    else:
        raise NotImplementedError(f"feature map {feature_map}")
    kv = jnp.einsum("bld,ble->bde", fk, v,
                    preferred_element_type=jnp.float32).astype(q.dtype)
    ksum = fk.sum(axis=-2)                                  # [BH, D]
    num = jnp.einsum("bld,bde->ble", fq, kv,
                     preferred_element_type=jnp.float32)
    den = jnp.einsum("bld,bd->bl", fq, ksum,
                     preferred_element_type=jnp.float32)[..., None] + 1e-5
    return num / den


class SparseLinearAttention(nn.Module):
    """o = BlockSparse(q,k,v) + ZeroInitProj(LinearAttn(φ(q),φ(k),v)).

    Operates on [B, H, L, D]-shaped heads like the reference module
    (SLA/core.py:83); block map building is part of the forward.
    """

    head_dim: int
    topk: float = 0.1
    feature_map: str = "softmax"
    block_q: int = 256
    block_k: int = 256
    impl: str = "auto"         # auto: pallas on TPU, xla elsewhere
    bwd_impl: str = "auto"
    quant: str = "none"        # none | int8 (SageSLA analogue: int8 Q/K on
                               # the MXU int8 path, bf16 V, per-row scales)

    def _resolve(self, setting: str) -> str:
        if setting != "auto":
            return setting
        return "pallas" if jax.default_backend() == "tpu" else "xla"

    @nn.compact
    def __call__(
        self, q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
        return_sparsity: bool = False,
    ):
        impl, bwd_impl = self._resolve(self.impl), self._resolve(self.bwd_impl)
        B, H, L, D = q.shape
        dtype = q.dtype
        qf = q.reshape(B * H, L, D)
        kf = k.reshape(B * H, L, D)
        vf = v.reshape(B * H, L, D)

        _, lut, real_topk = get_block_map(
            qf, kf, self.topk, self.block_q, self.block_k
        )
        if self.quant == "int8":
            from .int8_attention import int8_block_sparse_attention

            o_s = int8_block_sparse_attention(
                qf.astype(jnp.bfloat16), kf.astype(jnp.bfloat16),
                vf.astype(jnp.bfloat16), lut, self.block_q, self.block_k,
                None, True, bwd_impl, impl != "pallas",
            )
        else:
            o_s = block_sparse_attention(
                qf.astype(jnp.bfloat16), kf.astype(jnp.bfloat16), vf.astype(jnp.bfloat16),
                lut, self.block_q, self.block_k, None, impl, bwd_impl,
            )
        # linear branch in the inputs' dtype (bf16 on TPU, matching the
        # reference's autocast; f32 models keep f32 here). The SPARSE branch
        # above is bf16 regardless — the Pallas kernels are bf16-tiled with
        # f32 softmax/accumulators (a TPU kernel contract, not a precision
        # choice the model dtype controls).
        o_l = _linear_attention(qf, kf, vf, self.feature_map)
        proj = nn.Dense(
            D, kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name="proj_l",
        )
        o = (o_s.astype(jnp.float32) + proj(o_l)).astype(dtype)
        o = o.reshape(B, H, L, D)
        if return_sparsity:
            n_blocks = -(-L // self.block_k)
            return o, real_topk / n_blocks
        return o
