"""Pipeline-parallel WanDiT forward: the block stack over a `pipe` mesh axis.

Couples the generic GPipe pipeline (parallel/pp.py) to WanDiT's scan-layout
parameter stack: each pipeline stage holds n_layers/S contiguous WanBlocks
(the [n_layers, ...] leaves shard their leading axis on `pipe`, see
pp_layer_sharding), microbatches stream through stages with ppermute
hand-offs, and the patch/time/text embeds + modulated head stay replicated
outside the pipelined region. This is the cross-pod scaling axis the
reference (single-GPU, SURVEY.md §2.4) has no counterpart for; within a pod
prefer (data, model) TP (parallel/tp.py).

Usage:
    model  = WanDiT(..., layer_mode="scan")         # init exactly as usual
    params = model.init(key, *inputs)
    out    = wan_pp_apply(model, params, latents, t, context,
                          mesh=mesh, n_microbatches=8)

Training: build the override inside the loss so gradients flow to the
stacked block params through the pipeline's closure:
    def loss(params):
        out = wan_pp_apply(model, params, ..., mesh=mesh, n_microbatches=8)
        return ((out - target) ** 2).mean()
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from jax.sharding import Mesh

from ..parallel.pp import pipeline_blocks, scan_blocks
from .wan_dit import WanDiT, _WanBlockScanBody

BLOCKS_KEY = "blocks"  # nn.scan collection name inside WanDiT params


def _single_block(model: WanDiT) -> _WanBlockScanBody:
    return _WanBlockScanBody(
        dim=model.dim, n_heads=model.n_heads, ffn_dim=model.ffn_dim,
        attn_mode=model.attn_mode, sla_topk=model.sla_topk,
        sla_block=model.sla_block, lora_rank=model.lora_rank,
        lora_alpha=model.lora_alpha, lora_targets=model.lora_targets,
        ffn_mode=model.ffn_mode, n_experts=model.n_experts,
        capacity_factor=model.capacity_factor,
        dtype=model.dtype,
    )


def make_pp_blocks_override(
    model: WanDiT,
    stacked_block_params: Any,
    mesh: Mesh,
    n_microbatches: int,
    pipe_axis: str = "pipe",
    mode: str = "manual",
):
    """(x, ctx, t_mod, rope) -> x running the stacked WanBlocks pipelined.

    `stacked_block_params` is params["params"]["blocks"] from a scan-mode
    init — leaves lead with the n_layers axis, which must divide by the
    pipe-axis size."""
    single = _single_block(model)

    def single_fn(layer_params, x, c):
        ctx, t_mod, rope = c
        y, _ = single.apply({"params": layer_params}, x, ctx, t_mod, rope)
        return y

    stage_fn = scan_blocks(single_fn)

    def override(x, ctx, t_mod, rope):
        return pipeline_blocks(
            stage_fn, stacked_block_params, x, (ctx, t_mod, rope),
            mesh=mesh, n_microbatches=n_microbatches, pipe_axis=pipe_axis,
            mode=mode,
        )

    return override


def wan_pp_apply(
    model: WanDiT,
    params: Any,
    latents: jnp.ndarray,
    t: jnp.ndarray,
    context: jnp.ndarray,
    *,
    mesh: Mesh,
    n_microbatches: int,
    pipe_axis: str = "pipe",
    mode: str = "manual",
    frame_indices: Optional[jnp.ndarray] = None,
    extra_context: Optional[jnp.ndarray] = None,
):
    """Forward a scan-layout WanDiT with its block stack pipeline-parallel.

    Numerics match `model.apply(params, ...)` exactly (same layer order);
    only the schedule changes. Differentiable — take grads of a loss wrapped
    around this call and the block grads arrive via the pipeline transpose.
    mode="partial" enables the 3D composition: put the stacked block params
    on pp_tp_param_sharding(...) and GSPMD runs Megatron TP inside each
    pipeline stage."""
    if model.layer_mode != "scan":
        raise ValueError("wan_pp_apply needs the stacked scan param layout "
                         f"(layer_mode='scan'), got {model.layer_mode!r}")
    block_params = params["params"][BLOCKS_KEY]
    pp_model = model.clone(blocks_override=make_pp_blocks_override(
        model, block_params, mesh, n_microbatches, pipe_axis, mode))
    return pp_model.apply(
        params, latents, t, context,
        frame_indices=frame_indices, extra_context=extra_context,
    )
