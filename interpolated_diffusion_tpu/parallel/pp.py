"""Pipeline parallelism over a `pipe` mesh axis (GPipe schedule, ppermute).

Extends the distribution layer beyond the reference (single-GPU only,
SURVEY.md §2.4/§5.8) with the third classic axis after DP (mesh.py) and TP
(tp.py): the stacked-layer ("scan over layers") parameter layout used by the
big DiT backbones shards its LEADING layer axis over `pipe`, so each device
holds a contiguous stage of layers, and microbatches stream through the
stages with `lax.ppermute` hand-offs — activations ride ICI neighbor links,
never the host.

Schedule: plain GPipe. With S stages and M microbatches the loop runs
M + S - 1 ticks; at tick t, stage s processes microbatch (t - s). Bubble
fraction is (S-1)/(M+S-1) — pick M ≥ 4·S for >80 % utilisation. Reverse-mode
AD through `shard_map` produces the mirrored backward pipeline automatically
(the transpose of `ppermute` is the reverse permute; parameters replicated
over `data` get their gradients psum'd over `data` by the transpose rule),
so the same function trains.

Composition: the mesh may carry a `data` axis (batch-sharded DP) alongside
`pipe`; each data-parallel group runs an independent pipeline. TP inside a
stage would need nested manual collectives and is intentionally out of
scope — on a v5e slice use (data, pipe) for cross-pod scaling and (data,
model) within a pod.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8 (check_vma supersedes check_rep; axis_names = manual set)
    from jax import shard_map as _shard_map

    def shard_map(f, *, mesh, in_specs, out_specs, check_rep=True,
                  manual_axes=None):
        kw = {"axis_names": set(manual_axes)} if manual_axes else {}
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=check_rep, **kw)
except ImportError:  # pragma: no cover — older jax
    from jax.experimental.shard_map import shard_map as _shard_map_old

    def shard_map(f, *, mesh, in_specs, out_specs, check_rep=True,
                  manual_axes=None):
        kw = {}
        if manual_axes:
            kw["auto"] = frozenset(mesh.axis_names) - set(manual_axes)
        return _shard_map_old(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_rep=check_rep, **kw)

# block_fn(stage_params, x, ctx) -> x_out
#   stage_params: the stage's [n_layers/S, ...] slice of the stacked params
#   x:            one microbatch of activations [mb, ...]
#   ctx:          per-microbatch broadcast context pytree (e.g. time
#                 embeddings [mb, ...]); None when the caller passes none
BlockFn = Callable[[Any, jnp.ndarray, Any], jnp.ndarray]


def scan_blocks(single_block_fn: Callable[[Any, jnp.ndarray, Any], jnp.ndarray]) -> BlockFn:
    """Lift a one-layer fn into a stage fn that scans its local layer stack."""

    def stage_fn(stage_params, x, ctx):
        def body(h, layer_params):
            return single_block_fn(layer_params, h, ctx), None

        out, _ = lax.scan(body, x, stage_params)
        return out

    return stage_fn


def pipeline_blocks(
    block_fn: BlockFn,
    stacked_params: Any,
    x: jnp.ndarray,
    ctx: Any = None,
    *,
    mesh: Mesh,
    n_microbatches: int,
    pipe_axis: str = "pipe",
    data_axis: Optional[str] = "data",
    mode: str = "manual",
) -> jnp.ndarray:
    """Apply a stacked-layer block over `x` pipelined across the pipe axis.

    stacked_params: pytree whose leaves lead with the layer axis
        [n_layers, ...]; n_layers must divide by the pipe-axis size (each
        stage owns n_layers/S contiguous layers).
    x: [B, ...] activations (B = global batch when `data_axis` is on the
        mesh; the local batch must divide by n_microbatches).
    ctx: optional pytree broadcast to every stage; leaves with a leading
        batch dim are microbatched alongside x, scalars/tables replicated.

    mode:
      "manual"  — the whole mesh is manual: batch explicitly sharded over
                  `data_axis`, every other non-pipe axis replicated.
      "partial" — ONLY `pipe_axis` is manual; all other mesh axes stay under
                  GSPMD. This is the 3D-parallel composition path: batch
                  sharding over `data` and Megatron TP over `model`
                  (parallel/tp.py) propagate from the outer jit straight
                  through the pipeline body, so DP x PP x TP needs no manual
                  collectives beyond the pipeline's own ppermute.

    Returns block-stack output [B, ...], numerically identical to the
    sequential `lax.scan` application of all layers (same layer order).
    """
    S = mesh.shape[pipe_axis]
    M = n_microbatches
    if mode not in ("manual", "partial"):
        raise ValueError(f"unknown pipeline mode {mode!r}")
    partial_mode = mode == "partial"
    have_data = (not partial_mode and data_axis is not None
                 and data_axis in mesh.axis_names)
    d_ax = data_axis if have_data else None

    def param_spec(leaf):
        return P(pipe_axis, *([None] * (max(leaf.ndim, 1) - 1)))

    def batch_spec(leaf):
        if getattr(leaf, "ndim", 0) >= 1 and leaf.shape[0] == x.shape[0]:
            return P(d_ax, *([None] * (leaf.ndim - 1)))
        return P()

    params_specs = jax.tree_util.tree_map(param_spec, stacked_params)
    x_spec = P(d_ax, *([None] * (x.ndim - 1)))
    ctx_specs = jax.tree_util.tree_map(batch_spec, ctx)
    # decide OUTSIDE which ctx leaves carry a batch axis (leading dim == the
    # global batch); inside the shard the local batch is smaller and a
    # leading-dim heuristic would misread per-layer tables
    ctx_batched = jax.tree_util.tree_map(
        lambda l: getattr(l, "ndim", 0) >= 1 and l.shape[0] == x.shape[0], ctx)

    def _microbatch(tree):
        return jax.tree_util.tree_map(
            lambda l, b: l.reshape(M, l.shape[0] // M, *l.shape[1:]) if b else l,
            tree, ctx_batched,
        )

    def _mb_slice(tree, i):
        return jax.tree_util.tree_map(
            lambda l, b: (lax.dynamic_index_in_dim(l, i, 0, keepdims=False)
                          if b else l),
            tree, ctx_batched,
        )

    @partial(
        shard_map, mesh=mesh,
        in_specs=(params_specs, x_spec, ctx_specs),
        out_specs=x_spec, check_rep=False,
        manual_axes={pipe_axis} if partial_mode else None,
    )
    def run(local_params, x_local, ctx_local):
        stage = lax.axis_index(pipe_axis)
        B_local = x_local.shape[0]
        if B_local % M:
            raise ValueError(f"local batch {B_local} not divisible by "
                             f"n_microbatches={M}")
        x_mb = x_local.reshape(M, B_local // M, *x_local.shape[1:])
        ctx_mb = _microbatch(ctx_local)
        perm = [(i, (i + 1) % S) for i in range(S)]

        def tick(carry, t):
            recv, outs = carry
            # stage s works on microbatch (t - s); clip keeps the index
            # static-shape legal during fill/drain (results are masked off)
            mb = jnp.clip(t - stage, 0, M - 1)
            x_in = lax.dynamic_index_in_dim(x_mb, mb, 0, keepdims=False)
            cur = jnp.where(stage == 0, x_in, recv)
            cur = block_fn(local_params, cur, _mb_slice(ctx_mb, mb))
            recv_next = lax.ppermute(cur, pipe_axis, perm)
            out_idx = jnp.clip(t - (S - 1), 0, M - 1)
            prev = lax.dynamic_index_in_dim(outs, out_idx, 0, keepdims=False)
            take = (t >= S - 1) & (stage == S - 1)
            outs = lax.dynamic_update_index_in_dim(
                outs, jnp.where(take, cur, prev), out_idx, 0)
            return (recv_next, outs), None

        # scan (not fori_loop/while_loop) so reverse-mode AD can unroll the
        # mirrored backward pipeline through the ticks
        outs0 = jnp.zeros_like(x_mb)
        (_, outs), _ = lax.scan(
            tick, (jnp.zeros_like(x_mb[0]), outs0),
            jnp.arange(M + S - 1))
        # only the last stage holds real outputs; one masked psum
        # rebroadcasts them to the whole pipe group (cost: one extra
        # all-reduce of the output — fine next to the block-stack FLOPs)
        outs = lax.psum(jnp.where(stage == S - 1, outs, 0.0), pipe_axis)
        return outs.reshape(B_local, *x_local.shape[1:])

    return run(stacked_params, x, ctx)


def pp_tp_param_sharding(stacked_params: Any, mesh: Mesh,
                         pipe_axis: str = "pipe") -> Any:
    """Storage shardings for 3D parallelism (DP x PP x TP): each leaf's
    leading layer axis on `pipe`, Megatron column/row TP rules
    (parallel/tp.py) on the feature dims. Combine with
    pipeline_blocks(mode="partial") — the pipe axis is manual, and GSPMD
    propagates the model-axis splits through the stage bodies."""
    from jax.sharding import NamedSharding

    from .tp import tp_param_sharding

    tp_specs = tp_param_sharding(stacked_params, mesh)

    def combine(leaf, ns):
        spec = list(ns.spec) + [None] * (leaf.ndim - len(ns.spec))
        spec[0] = pipe_axis
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map(combine, stacked_params, tp_specs)


def pp_layer_sharding(stacked_params: Any, mesh: Mesh,
                      pipe_axis: str = "pipe") -> Any:
    """NamedSharding pytree placing each leaf's leading layer axis on `pipe`
    (storage-side twin of pipeline_blocks' in_specs — device_put the params
    once so each stage holds only its own layers in HBM)."""
    from jax.sharding import NamedSharding

    def spec(leaf):
        return NamedSharding(
            mesh, P(pipe_axis, *([None] * (max(leaf.ndim, 1) - 1))))

    return jax.tree_util.tree_map(spec, stacked_params)
