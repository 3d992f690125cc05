"""Pre-norm FiLM transformer encoder.

Capability parity with reference src/models/transformer.py: per-block FiLM
(γ/β from a conditioning vector) applied after each pre-norm, SiLU FFN,
optional causal masking, optional activation rematerialization.

TPU-native design: attention is a single fused QKV projection + einsum
softmax attention (XLA fuses the elementwise chain into the matmuls; the
Pallas block-sparse kernel in kernels/ is swapped in for long-sequence video
workloads). Computation dtype is configurable (bf16 on TPU, f32 params).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..kernels.small_mha import (
    SMALL_MHA_MAX_ROWS, small_mha, small_mha_packed,
)

# Small-L attention policy (env ID_TPU_SMALL_ATTN, read at trace time so
# benchmarks can A/B it between jit builds):
#   full  — pack all heads into one block-diagonal matmul when H·L ≤ 256,
#           per-head attention otherwise (DEFAULT — wins the fused e2e
#           pipeline A/B on v5e: 4433 samples/s vs 4017 group / 3451 none)
#   group — grouped tile-aligned packing, G = largest divisor of H with
#           G*L <= 128: 2.9× faster than per-head for the RAW op at T=64,
#           but a net loss inside the fused pipeline (the f32 [G·L, G·L]
#           logits + mask materialization defeat XLA's LN/FiLM fusion)
#   none  — always per-head batched attention

Dtype = Any


def dense_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    causal: bool = False,
) -> jnp.ndarray:
    """Multi-head attention over [B, H, L, Dh] with f32 softmax accumulators."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    if causal:
        L = q.shape[-2]
        mask = jnp.tril(jnp.ones((L, L), dtype=bool))
        logits = jnp.where(mask[None, None], logits, -1e30)
    probs = nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


# When L is small, per-(B,H) batched attention degenerates into thousands
# of MXU micro-matmuls ([L,Dh]@[Dh,L] each using 1/16th of a 128-tile) —
# padding waste dominates. We instead stack G heads along the row axis
# ([B·H/G, G·L, Dh]) and run ONE tile-aligned batched matmul per group with
# a static block-diagonal mask: numerically identical (off-block logits are
# -inf). Measured v5e: K=8 full pack 2.10 → 1.17 ms per 12-layer stack;
# T=64 G=2 raw attention 11.36 → 3.88 ms (see _blockdiag_group).


def dense_attention_blockdiag(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    causal: bool = False,
    group: Optional[int] = None,
) -> jnp.ndarray:
    """Same contract as dense_attention ([B, H, L, Dh]) via grouped
    concat-heads: G heads stack along the row axis and run as ONE batched
    [G·L, G·L] matmul with a static block-diagonal mask (off-block logits
    -inf → numerically identical to per-head attention).

    group=None packs ALL heads (the original H·L ≤ 256 fast path). An
    explicit G < H trades G× redundant off-block logits for full MXU tile
    utilization — at L=64, Dh=32 the per-head matmuls use 1/16 of a 128-tile,
    so G=2 (128 aligned rows) wins despite 2× logits (see docs/RESULTS.md
    "Small-L attention"). G must divide H."""
    B, H, L, Dh = q.shape
    G = H if group is None else group
    nG = H // G
    scale = Dh ** -0.5
    qc = q.reshape(B * nG, G * L, Dh)
    kc = k.reshape(B * nG, G * L, Dh)
    vc = v.reshape(B * nG, G * L, Dh)
    logits = jnp.einsum("bqd,bkd->bqk", qc, kc).astype(jnp.float32) * scale
    block = jnp.tril(jnp.ones((L, L), dtype=jnp.float32)) if causal else jnp.ones(
        (L, L), dtype=jnp.float32)
    mask = jnp.kron(jnp.eye(G, dtype=jnp.float32), block).astype(bool)
    logits = jnp.where(mask[None], logits, -1e30)
    probs = nn.softmax(logits, axis=-1).astype(vc.dtype)
    return jnp.einsum("bqk,bkd->bqd", probs, vc).reshape(B, H, L, Dh)


def _blockdiag_group(H: int, L: int, max_rows: int = 128) -> int:
    """Largest divisor G of H with G·L ≤ max_rows (1 = no packing pays).

    max_rows=128 = one MXU tile edge. Measured at B=256, H=12, Dh=32 on v5e
    (scripts in docs/RESULTS.md "Small-L attention"): at L=64 the G=2 packing
    (128 rows) runs 3.88 ms vs 11.36 dense and 5.88 at G=4 (256 rows);
    non-tile-aligned packings LOSE (G=3 → 192 rows → 13.4 ms), so the bound
    is a tile edge, not a budget."""
    from ..kernels.tuning import small_attn_policy

    policy = small_attn_policy()
    if policy == "none":
        return 1
    if policy in ("full", "fused"):
        # 'fused' reaching here means its Pallas precondition failed
        # (causal / tiny H·L) — the XLA full pack is the proven fallback
        return H if H * L <= 256 else 1
    G = max(1, min(H, max_rows // max(1, L)))
    while G > 1 and H % G:
        G -= 1
    return G


def _use_fused_block_policy(H: int, L: int, causal: bool, dropout: float,
                            attn_impl: str) -> bool:
    """Whole-block fusion applicability (kernels/fused_block.py): the
    small/mid-L regime where the profile shows the fusion boundary is the
    cost; causal and sharded-attention variants keep their own paths, and
    dropout (train-only, 0.0 in every shipped config) is unsupported
    inside the kernel."""
    from ..kernels.tuning import small_attn_policy

    return (small_attn_policy() == "block" and not causal
            and attn_impl == "dense" and dropout == 0.0
            and L <= 256 and H * L <= 8192
            and not os.environ.get("ID_TPU_PROFILE_SKIP_ATTN"))


def _use_fused_packed(H: int, L: int, causal: bool) -> bool:
    """The round-4 Pallas batch-packed kernel's applicability window:
    mid-size rows where per-head XLA attention is micro-matmul-bound but the
    XLA full pack's H·L logits would be too large (docs/RESULTS.md
    postmortem). Causal stays on the XLA paths (the kernel has no causal
    mask; the causal models run chunked anyway)."""
    from ..kernels.tuning import small_attn_policy

    return (small_attn_policy() == "fused" and not causal
            and 256 < H * L and L <= 256)


class TransformerBlock(nn.Module):
    d_model: int
    n_heads: int
    d_ff: int
    dropout: float = 0.0
    use_film: bool = True
    causal: bool = False
    use_small_mha: bool = False
    dtype: Dtype = jnp.float32
    # attn_impl="ring": run attention as ring attention over the mesh axis
    # `seq_axis` — the module must then be applied INSIDE shard_map with the
    # T axis sharded on that axis and global positions supplied by the
    # caller (denoisers accept pos_frac). Parameter tree is identical to
    # dense, so trained checkpoints load unchanged. "ring_sla" additionally
    # restricts each hop to the global top-k key blocks (non-causal only;
    # linear branch omitted — its zero-init projection contributes nothing
    # for checkpoints trained dense). (parallel/ring.py, parallel/ring_sla.py)
    attn_impl: str = "dense"
    seq_axis: str = "seq"

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        cond: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        B, L, _ = x.shape
        H = self.n_heads
        Dh = self.d_model // H

        def film(h, name):
            if not self.use_film or cond is None:
                return h
            gb = nn.Dense(self.d_model * 2, dtype=self.dtype, name=name)(cond)
            gamma, beta = jnp.split(gb, 2, axis=-1)
            return h * (1.0 + gamma[:, None, :]) + beta[:, None, :]

        if _use_fused_block_policy(H, L, self.causal, self.dropout,
                                   self.attn_impl):
            # round-5 whole-block kernel (kernels/fused_block.py): LN+FiLM+
            # QKV+blockdiag-MHA+out-proj+FFN in ONE pallas_call, weights
            # VMEM-resident across grid steps. Param names/shapes identical
            # to the unfused path (the dummy calls below materialize them;
            # their outputs are dead code XLA removes), so checkpoints are
            # interchangeable. Policy ID_TPU_SMALL_ATTN=block.
            from ..kernels.fused_block import fused_film_block
            from ..kernels.tuning import fused_group_b

            ln1 = nn.LayerNorm(dtype=self.dtype, name="norm1")
            ln2 = nn.LayerNorm(dtype=self.dtype, name="norm2")
            qkv_mod = nn.Dense(3 * self.d_model, dtype=self.dtype, name="qkv")
            out_mod = nn.Dense(self.d_model, dtype=self.dtype, name="attn_out")
            ff1_mod = nn.Dense(self.d_ff, dtype=self.dtype, name="ff1")
            ff2_mod = nn.Dense(self.d_model, dtype=self.dtype, name="ff2")
            _ = ln2(ln1(x))
            _ = out_mod(qkv_mod(x)[..., : self.d_model])
            _ = ff2_mod(ff1_mod(x))
            if self.use_film and cond is not None:
                gb1 = nn.Dense(self.d_model * 2, dtype=self.dtype,
                               name="film1")(cond)
                gb2 = nn.Dense(self.d_model * 2, dtype=self.dtype,
                               name="film2")(cond)
                film_on = True
            else:
                gb1 = gb2 = jnp.zeros((B, 2 * self.d_model), self.dtype)
                film_on = False
            pv = lambda m: m.variables["params"]
            return fused_film_block(
                x.astype(self.dtype), gb1, gb2,
                pv(ln1)["scale"], pv(ln1)["bias"],
                pv(ln2)["scale"], pv(ln2)["bias"],
                pv(qkv_mod)["kernel"], pv(qkv_mod)["bias"],
                pv(out_mod)["kernel"], pv(out_mod)["bias"],
                pv(ff1_mod)["kernel"], pv(ff1_mod)["bias"],
                pv(ff2_mod)["kernel"], pv(ff2_mod)["bias"],
                H, fused_group_b(L), film_on,
            )

        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        h = film(h, "film1")
        qkv = nn.Dense(3 * self.d_model, dtype=self.dtype, name="qkv")(h)
        if self.attn_impl in ("ring", "ring_sla"):
            # sequence-sharded attention: L here is the LOCAL shard length
            qkv5 = qkv.reshape(B, L, 3, H, Dh).transpose(2, 0, 3, 1, 4)
            if self.attn_impl == "ring":
                from ..parallel.ring import ring_self_attention

                attn = ring_self_attention(
                    qkv5[0], qkv5[1], qkv5[2], axis_name=self.seq_axis,
                    causal=self.causal)
            else:
                if self.causal:
                    raise ValueError("ring_sla attention has no causal mask")
                from ..parallel.ring_sla import ring_sla_self_attention

                o_s, _ = ring_sla_self_attention(
                    qkv5[0].reshape(B * H, L, Dh),
                    qkv5[1].reshape(B * H, L, Dh),
                    qkv5[2].reshape(B * H, L, Dh),
                    axis_name=self.seq_axis)
                attn = o_s.reshape(B, H, L, Dh)
            attn = attn.transpose(0, 2, 1, 3).reshape(B, L, self.d_model)
        elif os.environ.get("ID_TPU_PROFILE_SKIP_ATTN"):
            # profiling skeleton ONLY (scripts/profile_pipeline.py): keep
            # every projection but remove the attention math, so the
            # attention share of a block is (full - skeleton). Never set in
            # production — outputs are meaningless.
            attn = qkv[..., : self.d_model]
        elif (self.use_small_mha and not self.causal
                and H * L <= SMALL_MHA_MAX_ROWS):
            # packed Pallas MHA: no head transpose, logits stay in VMEM.
            # Opt-in only: in isolation it beats per-head XLA attention
            # (10.1 vs 11.6 ms per 12-layer stack at T=64), but inside the
            # full block the pallas_call blocks XLA fusion with the
            # surrounding LN/FiLM chain and loses ~3% end-to-end.
            qkv3 = qkv.reshape(B, L, 3, self.d_model)
            attn = small_mha(qkv3[:, :, 0], qkv3[:, :, 1], qkv3[:, :, 2], H)
        elif _use_fused_packed(H, L, self.causal):
            # round-4 default at 256 < H·L: G batch elements share one
            # [G·L, G·L] block-diagonal matmul per head with the logits
            # resident in VMEM (kernels/small_mha.small_mha_packed) — the
            # grouped-packing postmortem's identified fix (docs/RESULTS.md)
            from ..kernels.tuning import fused_group_b

            qkv3 = qkv.reshape(B, L, 3, self.d_model)
            attn = small_mha_packed(
                qkv3[:, :, 0], qkv3[:, :, 1], qkv3[:, :, 2], H,
                fused_group_b(L),
            )
        else:
            qkv = qkv.reshape(B, L, 3, H, Dh).transpose(2, 0, 3, 1, 4)
            G = _blockdiag_group(H, L)
            if G > 1:
                attn = dense_attention_blockdiag(
                    qkv[0], qkv[1], qkv[2], causal=self.causal, group=G)
            else:
                attn = dense_attention(qkv[0], qkv[1], qkv[2],
                                       causal=self.causal)
            attn = attn.transpose(0, 2, 1, 3).reshape(B, L, self.d_model)
        attn = nn.Dense(self.d_model, dtype=self.dtype, name="attn_out")(attn)
        if self.dropout > 0.0:
            attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        x = x + attn

        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = film(h, "film2")
        h = nn.Dense(self.d_ff, dtype=self.dtype, name="ff1")(h)
        h = nn.silu(h)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="ff2")(h)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return x + h


class TransformerEncoder(nn.Module):
    d_model: int = 256
    n_layers: int = 8
    n_heads: int = 8
    d_ff: int = 1024
    dropout: float = 0.0
    use_film: bool = True
    causal: bool = False
    use_remat: bool = False
    dtype: Dtype = jnp.float32
    attn_impl: str = "dense"   # see TransformerBlock.attn_impl
    seq_axis: str = "seq"

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        cond: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        block_cls = TransformerBlock
        if self.use_remat:
            block_cls = nn.remat(TransformerBlock, static_argnums=(3,))
        for i in range(self.n_layers):
            x = block_cls(
                d_model=self.d_model,
                n_heads=self.n_heads,
                d_ff=self.d_ff,
                dropout=self.dropout,
                use_film=self.use_film,
                causal=self.causal,
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                seq_axis=self.seq_axis,
                name=f"block_{i}",
            )(x, cond, deterministic)
        return x
