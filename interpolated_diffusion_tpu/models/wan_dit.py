"""Wan2.1-style video DiT backbone, TPU-native.

Capability parity with the reference's Wan integration layer: the backbone
the reference loads from diffusers (src/models/wan_backbone.py) re-implemented
as a flax module with the same architecture family (patch-embed (1,2,2),
adaLN-zero blocks with per-block scale-shift tables, RMS-normed QK, 3D rotary
embeddings with the Wan t/h/w head-dim split, cross-attention to text
context); the absolute-time RoPE variant (src/models/wan_abs_rope.py:9-118 —
per-sample frame-index gather from the precomputed frequency tables, split
t/h/w) is a forward argument instead of module state; the SLA processor swap
(src/models/wan_sla.py:145-169) is the `attn_mode="sla"` config that routes
self-attention through the Pallas block-sparse + linear kernel; the
frame-conditioning projector (src/models/wan_frame_cond.py:7 — zero-init
per-frame features → extra cross-attn tokens) is FrameCondProjector.

Weight conversion from Wan2.1 safetensors maps 1:1 onto these parameters
(same shapes at dim=1536/30 blocks/12 heads/ffn 8960); conversion tooling is
a follow-up — from-scratch training uses the same module.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..kernels.sla import SparseLinearAttention
from .denoisers import timestep_embedding
from .transformer import dense_attention
from ..kernels.block_sparse_attention import _pad_len

Dtype = Any


# ---------------------------------------------------------------------------
# 3D rotary embeddings (Wan head-dim split: h = w = 2*(d//6), t = rest)
# ---------------------------------------------------------------------------

def wan_rope_tables(max_seq_len: int, head_dim: int, theta: float = 10000.0):
    """Per-axis (t, h, w) cos/sin tables, each [max_seq_len, axis_dim/2]."""
    h_dim = 2 * (head_dim // 6)
    w_dim = h_dim
    t_dim = head_dim - h_dim - w_dim
    tables = {}
    for name, dim in (("t", t_dim), ("h", h_dim), ("w", w_dim)):
        freqs = 1.0 / (theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
        angles = jnp.arange(max_seq_len, dtype=jnp.float32)[:, None] * freqs[None]
        tables[name] = (jnp.cos(angles), jnp.sin(angles))
    return tables, (t_dim, h_dim, w_dim)


def build_rope_freqs(
    tables, dims: Tuple[int, int, int],
    ppf: int, pph: int, ppw: int,
    frame_indices: Optional[jnp.ndarray] = None,
    batch: int = 1,
):
    """Assemble per-token (cos, sin) of shape [B or 1, ppf*pph*ppw, head_dim/2].

    frame_indices [B, ppf] enables absolute-time RoPE (short K-frame inputs
    carrying original frame positions, reference wan_abs_rope.py:99-118).
    """
    t_dim, h_dim, w_dim = dims
    (t_cos, t_sin), (h_cos, h_sin), (w_cos, w_sin) = (
        tables["t"], tables["h"], tables["w"]
    )
    if frame_indices is not None:
        tc = t_cos[frame_indices]          # [B, ppf, t_dim/2]
        ts = t_sin[frame_indices]
        B = frame_indices.shape[0]
    else:
        tc = t_cos[:ppf][None]
        ts = t_sin[:ppf][None]
        B = 1
    parts_cos = [
        jnp.broadcast_to(tc[:, :, None, None, :], (B, ppf, pph, ppw, t_dim // 2)),
        jnp.broadcast_to(h_cos[:pph][None, None, :, None, :], (B, ppf, pph, ppw, h_dim // 2)),
        jnp.broadcast_to(w_cos[:ppw][None, None, None, :, :], (B, ppf, pph, ppw, w_dim // 2)),
    ]
    parts_sin = [
        jnp.broadcast_to(ts[:, :, None, None, :], (B, ppf, pph, ppw, t_dim // 2)),
        jnp.broadcast_to(h_sin[:pph][None, None, :, None, :], (B, ppf, pph, ppw, h_dim // 2)),
        jnp.broadcast_to(w_sin[:ppw][None, None, None, :, :], (B, ppf, pph, ppw, w_dim // 2)),
    ]
    N = ppf * pph * ppw
    cos = jnp.concatenate(parts_cos, axis=-1).reshape(B, N, -1)
    sin = jnp.concatenate(parts_sin, axis=-1).reshape(B, N, -1)
    return cos, sin


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate interleaved pairs; x [B,H,L,D], cos/sin [B or 1, L, D/2]."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    cos = cos[:, None]
    sin = sin[:, None]
    y1 = x1 * cos - x2 * sin
    y2 = x1 * sin + x2 * cos
    out = jnp.stack([y1, y2], axis=-1).reshape(x.shape)
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# modules
# ---------------------------------------------------------------------------

class LoRADense(nn.Module):
    """Dense with runtime low-rank adaptation: y = x·W + b + (α/r)·(x·A)·B.

    `kernel`/`bias` sit at the SAME param paths as `nn.Dense`, so a plain
    base checkpoint drops straight in; `lora_A`/`lora_B` live alongside.
    Unlike merge-form LoRA (models/lora.py apply_lora, which materializes a
    full extra weight copy — ~2.9 GB bf16 at 1.3B scale), the low-rank delta
    is applied to ACTIVATIONS and the base is never duplicated; this is what
    lets Phase-1 `full`-length training fit a 16 GB chip.

    Reference semantics: src/models/lora.py (LoRALinear forward +
    mark_only_lora_trainable) — the trainable/frozen split is realized
    trainer-side as a structural param partition
    (train/wansynth_common.py::split_lora_params).
    """

    features: int
    rank: int = 0
    alpha: float = 16.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d_in = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (d_in, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x = x.astype(self.dtype)   # keep the residual stream in compute dtype
        y = x @ kernel.astype(self.dtype) + bias.astype(self.dtype)
        if self.rank <= 0:
            return y
        A = self.param("lora_A", nn.initializers.normal(1.0 / float(self.rank)),
                       (d_in, self.rank))
        Bm = self.param("lora_B", nn.initializers.zeros,
                        (self.rank, self.features))
        delta = (x @ A.astype(self.dtype)) @ Bm.astype(self.dtype)
        return y + delta * (self.alpha / float(self.rank))


def _dense(features, dtype, name, rank=0, alpha=16.0):
    """nn.Dense, or LoRADense when rank > 0 (runtime-form adapters)."""
    if rank > 0:
        return LoRADense(features=features, rank=rank, alpha=alpha,
                         dtype=dtype, name=name)
    return nn.Dense(features, dtype=dtype, name=name)


class RMSNorm(nn.Module):
    dim: int
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        return ((x * jax.lax.rsqrt(var + self.eps)).astype(self.dtype)
                * scale.astype(self.dtype))


class WanAttention(nn.Module):
    dim: int
    n_heads: int
    attn_mode: str = "dense"      # dense | sla (self-attention only)
    sla_topk: float = 0.1
    sla_block: int = 128
    lora_rank: int = 0            # runtime-form LoRA on q/k/v/o when > 0
    lora_alpha: float = 16.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, rope=None):
        B, L, _ = x.shape
        H = self.n_heads
        Dh = self.dim // H
        kv_src = x if context is None else context
        r, a = self.lora_rank, self.lora_alpha
        q = _dense(self.dim, self.dtype, "q_proj", r, a)(x)
        k = _dense(self.dim, self.dtype, "k_proj", r, a)(kv_src)
        v = _dense(self.dim, self.dtype, "v_proj", r, a)(kv_src)
        q = RMSNorm(self.dim, dtype=self.dtype, name="q_norm")(q)
        k = RMSNorm(self.dim, dtype=self.dtype, name="k_norm")(k)
        Lk = kv_src.shape[1]
        q = q.reshape(B, L, H, Dh).transpose(0, 2, 1, 3)
        k = k.reshape(B, Lk, H, Dh).transpose(0, 2, 1, 3)
        v = v.reshape(B, Lk, H, Dh).transpose(0, 2, 1, 3)
        if rope is not None:
            cos, sin = rope
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
        if self.attn_mode in ("sla", "sage_sla") and context is None:
            from ..kernels.tuning import sla_blocks

            quant = "int8" if self.attn_mode == "sage_sla" else "none"
            blk = sla_blocks(default=self.sla_block, quant=quant, L=L)
            out = SparseLinearAttention(
                head_dim=Dh, topk=self.sla_topk,
                block_q=blk, block_k=blk,
                quant=quant,
                name="sla",
            )(q, k, v)
        elif L >= 2048:
            # long-query exact attention (self OR cross): dense Pallas flash
            # kernel, O(L) memory — XLA attention would materialize the
            # [H, L, Lk] logits (6.7 GB f32 for cross-attn at Wan scale).
            from ..kernels.block_sparse_attention import flash_attention
            from ..kernels.tuning import flash_blocks

            bm, bn = flash_blocks()      # autotuned when ID_TPU_ATTN_TUNE set
            bn = bn if Lk >= bn else max(128, _pad_len(Lk, 128))
            out = flash_attention(
                q.reshape(B * H, L, Dh).astype(jnp.bfloat16),
                k.reshape(B * H, Lk, Dh).astype(jnp.bfloat16),
                v.reshape(B * H, Lk, Dh).astype(jnp.bfloat16),
                bm, bn,
            ).reshape(B, H, L, Dh).astype(q.dtype)
        else:
            out = dense_attention(q, k, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, self.dim)
        return _dense(self.dim, self.dtype, "o_proj", r, a)(out)


class WanBlock(nn.Module):
    dim: int
    n_heads: int
    ffn_dim: int
    attn_mode: str = "dense"
    sla_topk: float = 0.1
    sla_block: int = 256
    lora_rank: int = 0            # runtime-form LoRA rank (0 = plain Dense)
    lora_alpha: float = 16.0
    lora_targets: str = "attn,ffn"
    ffn_mode: str = "dense"       # dense | moe (Switch top-1 expert FFN)
    n_experts: int = 8
    capacity_factor: float = 1.25

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, t_mod, rope):
        targets = {t.strip() for t in self.lora_targets.split(",")}
        r_attn = self.lora_rank if "attn" in targets else 0
        r_ffn = self.lora_rank if "ffn" in targets else 0
        # t_mod: [B, 6, dim]; per-block learned scale-shift table added in.
        table = self.param(
            "scale_shift_table", nn.initializers.normal(0.02), (1, 6, self.dim)
        )
        mod = (table + t_mod).astype(jnp.float32)
        shift1, scale1, gate1, shift2, scale2, gate2 = [
            mod[:, i][:, None, :].astype(self.dtype) for i in range(6)
        ]
        h = nn.LayerNorm(use_bias=False, use_scale=False, dtype=self.dtype,
                         name="norm1")(x)
        h = h * (1 + scale1) + shift1
        x = x + gate1 * WanAttention(
            self.dim, self.n_heads, self.attn_mode, self.sla_topk, self.sla_block,
            lora_rank=r_attn, lora_alpha=self.lora_alpha,
            dtype=self.dtype, name="self_attn",
        )(h, rope=rope)
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        x = x + WanAttention(
            self.dim, self.n_heads, "dense",
            lora_rank=r_attn, lora_alpha=self.lora_alpha,
            dtype=self.dtype, name="cross_attn",
        )(h, context=context)
        h = nn.LayerNorm(use_bias=False, use_scale=False, dtype=self.dtype,
                         name="norm3")(x)
        h = h * (1 + scale2) + shift2
        if self.ffn_mode == "moe":
            from .moe import SwitchFFN

            h, aux = SwitchFFN(
                dim=self.dim, ffn_dim=self.ffn_dim, n_experts=self.n_experts,
                capacity_factor=self.capacity_factor, dtype=self.dtype,
                name="moe_ffn",
            )(h)
            self.sow("intermediates", "moe_aux", aux)
        else:
            h = _dense(self.ffn_dim, self.dtype, "ffn_in", r_ffn, self.lora_alpha)(h)
            h = nn.gelu(h, approximate=True)
            h = _dense(self.dim, self.dtype, "ffn_out", r_ffn, self.lora_alpha)(h)
        return x + gate2 * h


class WanBlockGroup(nn.Module):
    """Several consecutive blocks under ONE remat boundary — the saved
    activation per group is a single [B, L, dim] tensor, so remat_group=g
    divides bwd activation memory by g (at g× block recompute)."""

    n_blocks: int
    dim: int
    n_heads: int
    ffn_dim: int
    attn_mode: str = "dense"
    sla_topk: float = 0.1
    sla_block: int = 256
    lora_rank: int = 0
    lora_alpha: float = 16.0
    lora_targets: str = "attn,ffn"
    ffn_mode: str = "dense"
    n_experts: int = 8
    capacity_factor: float = 1.25
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, t_mod, rope):
        for i in range(self.n_blocks):
            x = WanBlock(
                dim=self.dim, n_heads=self.n_heads, ffn_dim=self.ffn_dim,
                attn_mode=self.attn_mode, sla_topk=self.sla_topk,
                sla_block=self.sla_block, lora_rank=self.lora_rank,
                lora_alpha=self.lora_alpha, lora_targets=self.lora_targets,
                ffn_mode=self.ffn_mode, n_experts=self.n_experts,
                capacity_factor=self.capacity_factor,
                dtype=self.dtype, name=f"block_{i}",
            )(x, context, t_mod, rope)
        return x


class _WanBlockScanBody(nn.Module):
    """nn.scan body: one WanBlock per layer with params stacked on axis 0.

    Carry = the token stream; context/t_mod/rope are nn.broadcast inputs.
    Under `jit`, XLA compiles ONE block and loops it (30× faster compiles
    than the unrolled stack), and under AD the backward pass holds one
    block's activations at a time instead of scheduling buffers across all
    30 unrolled blocks — this is what lets the Phase-1 `full`-length LoRA
    step fit a 16 GB chip (tracked as round-1 gap #2 in docs/PARITY.md)."""

    dim: int
    n_heads: int
    ffn_dim: int
    attn_mode: str = "dense"
    sla_topk: float = 0.1
    sla_block: int = 256
    lora_rank: int = 0
    lora_alpha: float = 16.0
    lora_targets: str = "attn,ffn"
    ffn_mode: str = "dense"
    n_experts: int = 8
    capacity_factor: float = 1.25
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, t_mod, rope):
        x = WanBlock(
            dim=self.dim, n_heads=self.n_heads, ffn_dim=self.ffn_dim,
            attn_mode=self.attn_mode, sla_topk=self.sla_topk,
            sla_block=self.sla_block, lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha, lora_targets=self.lora_targets,
            ffn_mode=self.ffn_mode, n_experts=self.n_experts,
            capacity_factor=self.capacity_factor,
            dtype=self.dtype, name="block",
        )(x, context, t_mod, rope)
        return x, None


def _iter_block_trees(params: Dict, n_layers: int):
    """Yield per-block param subtrees in layer order from a loop-layout tree
    (either `block_{i}` or remat-group `group_{g}/block_{j}` naming)."""
    if "block_0" in params:
        for i in range(n_layers):
            yield params[f"block_{i}"]
        return
    g = 0
    count = 0
    while f"group_{g}" in params:
        grp = params[f"group_{g}"]
        j = 0
        while f"block_{j}" in grp:
            yield grp[f"block_{j}"]
            count += 1
            j += 1
        g += 1
    if count != n_layers and g > 0:
        raise ValueError(f"found {count} blocks in groups, expected {n_layers}")


def stack_block_params(params: Dict, n_layers: int) -> Dict:
    """Convert a loop-layout WanDiT param tree (block_{i} / group_{g})
    to the scan layout: all per-block params stacked on a new leading
    layer axis under `blocks/block`. Non-block params pass through."""
    blocks = list(_iter_block_trees(params, n_layers))
    if len(blocks) != n_layers:
        raise ValueError(f"found {len(blocks)} blocks, expected {n_layers}")
    out = {
        k: v for k, v in params.items()
        if not (k.startswith("block_") or k.startswith("group_"))
    }
    out["blocks"] = {"block": jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *blocks
    )}
    return out


def unstack_block_params(params: Dict, n_layers: int) -> Dict:
    """Inverse of stack_block_params: scan layout → `block_{i}` loop layout."""
    out = {k: v for k, v in params.items() if k != "blocks"}
    stacked = params["blocks"]["block"]
    for i in range(n_layers):
        out[f"block_{i}"] = jax.tree_util.tree_map(lambda x: x[i], stacked)
    return out


class FrameCondProjector(nn.Module):
    """Per-frame features → extra cross-attn tokens in text space; zero-init
    output so the pretrained cross-attn is undisturbed at start."""

    feat_dim: int
    text_dim: int
    hidden_dim: int = 256
    n_layers: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray) -> jnp.ndarray:  # [B,T,F] -> [B,T,text_dim]
        h = feat.astype(self.dtype)
        if self.n_layers == 1:
            return nn.Dense(self.text_dim, kernel_init=nn.initializers.zeros,
                            bias_init=nn.initializers.zeros, dtype=self.dtype,
                            name="out")(h)
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc_0")(h)
        h = nn.gelu(h)
        for i in range(self.n_layers - 2):
            h = nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"fc_{i + 1}")(h)
            h = nn.gelu(h)
        return nn.Dense(self.text_dim, kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros, dtype=self.dtype,
                        name="out")(h)


class WanDiT(nn.Module):
    """Video diffusion transformer over [B, C, T, H, W] latents.

    Defaults are the Wan2.1-T2V-1.3B family (dim 1536, 30 blocks, 12 heads,
    ffn 8960, text dim 4096, patch (1,2,2), head_dim 128).
    """

    dim: int = 1536
    n_layers: int = 30
    n_heads: int = 12
    ffn_dim: int = 8960
    in_channels: int = 16
    out_channels: int = 16
    text_dim: int = 4096
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    max_seq_len: int = 1024
    freq_dim: int = 256
    attn_mode: str = "dense"
    sla_topk: float = 0.1
    sla_block: int = 256
    lora_rank: int = 0            # > 0 enables runtime-form LoRA in blocks
    lora_alpha: float = 16.0
    lora_targets: str = "attn,ffn"
    ffn_mode: str = "dense"       # dense | moe (Switch expert FFN per block)
    n_experts: int = 8
    capacity_factor: float = 1.25
    use_remat: bool = False
    remat_group: int = 1
    layer_mode: str = "loop"      # loop (unrolled, block_{i} params) |
                                  # scan (lax.scan over stacked blocks/block)
    # apply-time replacement for the whole block stack, (x, ctx, t_mod, rope)
    # -> x. Used by models/wan_pp.py to run the stack pipeline-parallel over
    # a `pipe` mesh axis with externally-held stacked params; init() must use
    # a plain scan-mode model (the override creates no params).
    blocks_override: Optional[Callable] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        latents: jnp.ndarray,            # [B, C, T, H, W]
        t: jnp.ndarray,                  # [B] diffusion timesteps
        context: jnp.ndarray,            # [B, L_text, text_dim]
        frame_indices: Optional[jnp.ndarray] = None,  # [B, T] absolute-time RoPE
        extra_context: Optional[jnp.ndarray] = None,  # [B, L_extra, text_dim]
        blocks_delta: Optional[jnp.ndarray] = None,   # [B, L_tok, dim] cached
        return_delta: bool = False,
    ) -> jnp.ndarray:
        """blocks_delta/return_delta implement FORA-style block caching for
        sampling (FORA, arXiv 2407.01425): on a full step, return the block
        stack's total residual (x_blocks_out − x_embed) alongside the output;
        on a cached step, skip all n_layers blocks and reuse that residual —
        the token embed, conditioning MLPs, and the time-modulated head still
        run fresh, so the prediction keeps first-order dependence on the new
        z_t and t. With every block cached, FORA's per-block reuse composes to
        exactly this single [B, L, dim] tensor (the deltas no longer depend on
        the in-flight stream), so one carried residual replaces n_layers
        caches. Training never uses this path."""
        B, C, T, H, W = latents.shape
        pt, ph, pw = self.patch_size
        ppf, pph, ppw = T // pt, H // ph, W // pw
        head_dim = self.dim // self.n_heads

        # patch embed (conv3d ≡ reshape + dense for stride == kernel)
        z = latents.reshape(B, C, ppf, pt, pph, ph, ppw, pw)
        z = jnp.transpose(z, (0, 2, 4, 6, 1, 3, 5, 7)).reshape(
            B, ppf * pph * ppw, C * pt * ph * pw
        )
        x = nn.Dense(self.dim, dtype=self.dtype, name="patch_embed")(z.astype(self.dtype))

        # time conditioning: sinusoid -> MLP -> dim; projected to 6*dim mods
        t_emb = timestep_embedding(t, self.freq_dim).astype(self.dtype)
        t_emb = nn.Dense(self.dim, dtype=self.dtype, name="time_fc1")(t_emb)
        t_emb = nn.silu(t_emb)
        t_emb = nn.Dense(self.dim, dtype=self.dtype, name="time_fc2")(t_emb)
        t_mod = nn.Dense(6 * self.dim, dtype=self.dtype, name="time_proj")(
            nn.silu(t_emb)
        ).reshape(B, 6, self.dim)

        # text conditioning
        ctx = nn.Dense(self.dim, dtype=self.dtype, name="text_fc1")(
            context.astype(self.dtype)
        )
        ctx = nn.gelu(ctx, approximate=True)
        ctx = nn.Dense(self.dim, dtype=self.dtype, name="text_fc2")(ctx)
        if extra_context is not None:
            ex = nn.Dense(self.dim, dtype=self.dtype, name="extra_fc1")(
                extra_context.astype(self.dtype)
            )
            ex = nn.gelu(ex, approximate=True)
            ex = nn.Dense(self.dim, dtype=self.dtype, name="extra_fc2")(ex)
            ctx = jnp.concatenate([ctx, ex], axis=1)

        if frame_indices is not None and pt != 1:
            frame_indices = frame_indices // pt
        tables, dims = wan_rope_tables(self.max_seq_len, head_dim)
        rope = build_rope_freqs(tables, dims, ppf, pph, ppw, frame_indices, B)

        x_embed = x
        if blocks_delta is not None:
            x = x_embed + blocks_delta.astype(x.dtype)
        elif self.blocks_override is not None:
            x = self.blocks_override(x, ctx, t_mod, rope)
        elif self.layer_mode == "scan":
            body = _WanBlockScanBody
            if self.use_remat:
                body = nn.remat(body, prevent_cse=False)
            scanned = nn.scan(
                body,
                variable_axes={"params": 0, "intermediates": 0},
                split_rngs={"params": True},
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
                length=self.n_layers,
            )(
                dim=self.dim, n_heads=self.n_heads, ffn_dim=self.ffn_dim,
                attn_mode=self.attn_mode, sla_topk=self.sla_topk,
                sla_block=self.sla_block, lora_rank=self.lora_rank,
                lora_alpha=self.lora_alpha, lora_targets=self.lora_targets,
                ffn_mode=self.ffn_mode, n_experts=self.n_experts,
                capacity_factor=self.capacity_factor,
                dtype=self.dtype, name="blocks",
            )
            x, _ = scanned(x, ctx, t_mod, rope)
        elif self.use_remat:
            group_cls = nn.remat(WanBlockGroup)
            i = 0
            g = 0
            while i < self.n_layers:
                n = min(self.remat_group, self.n_layers - i)
                x = group_cls(
                    n_blocks=n, dim=self.dim, n_heads=self.n_heads,
                    ffn_dim=self.ffn_dim, attn_mode=self.attn_mode,
                    sla_topk=self.sla_topk, sla_block=self.sla_block,
                    lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
                    lora_targets=self.lora_targets,
                    ffn_mode=self.ffn_mode, n_experts=self.n_experts,
                    capacity_factor=self.capacity_factor,
                    dtype=self.dtype, name=f"group_{g}",
                )(x, ctx, t_mod, rope)
                i += n
                g += 1
        else:
            for i in range(self.n_layers):
                x = WanBlock(
                    dim=self.dim, n_heads=self.n_heads, ffn_dim=self.ffn_dim,
                    attn_mode=self.attn_mode, sla_topk=self.sla_topk,
                    sla_block=self.sla_block, lora_rank=self.lora_rank,
                    lora_alpha=self.lora_alpha, lora_targets=self.lora_targets,
                    ffn_mode=self.ffn_mode, n_experts=self.n_experts,
                    capacity_factor=self.capacity_factor,
                    dtype=self.dtype, name=f"block_{i}",
                )(x, ctx, t_mod, rope)

        # final modulated norm + unpatchify. Wan semantics: the head table is
        # modulated by the TIME EMBEDDING itself (t_emb, [B, dim] broadcast to
        # both rows), not by the per-block 6-way projection — this matches the
        # pretrained Wan2.1 weights (diffusers WanTransformer3DModel forward:
        # shift, scale = (scale_shift_table + temb.unsqueeze(1)).chunk(2)).
        table = self.param(
            "head_scale_shift", nn.initializers.normal(0.02), (1, 2, self.dim)
        )
        delta = (x - x_embed) if return_delta else None
        mod = (table + t_emb[:, None].astype(jnp.float32))
        shift, scale = mod[:, 0][:, None].astype(self.dtype), mod[:, 1][:, None].astype(self.dtype)
        x = nn.LayerNorm(use_bias=False, use_scale=False, dtype=self.dtype,
                         name="norm_out")(x)
        x = x * (1 + scale) + shift
        x = nn.Dense(self.out_channels * pt * ph * pw, dtype=self.dtype,
                     name="proj_out")(x)
        x = x.reshape(B, ppf, pph, ppw, self.out_channels, pt, ph, pw)
        x = jnp.transpose(x, (0, 4, 1, 5, 2, 6, 3, 7)).reshape(
            B, self.out_channels, T, H, W
        )
        out = x.astype(jnp.float32)
        if return_delta:
            return out, delta
        return out
