"""Shared wansynth trainer plumbing: datasets, Wan/LoRA state, helpers."""
from __future__ import annotations

import argparse
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

from ..data.dataset import BatchLoader
from ..data.wan_synth import SyntheticWanDataset, WanSynthTarDataset
from ..models.lora import apply_lora, init_lora
from ..models.wan_dit import FrameCondProjector, WanDiT
from ..utils.memguard import add_memguard_args


def add_wansynth_data_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--data", type=str, default="synthetic", choices=["synthetic", "tar"])
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--anchors_root", type=str, default=None)
    p.add_argument("--num_samples", type=int, default=1000)
    p.add_argument("--T", type=int, default=21)
    p.add_argument("--latent_c", type=int, default=16)
    p.add_argument("--latent_h", type=int, default=60)
    p.add_argument("--latent_w", type=int, default=104)
    p.add_argument("--text_len", type=int, default=512)
    p.add_argument("--text_dim", type=int, default=4096)
    p.add_argument("--prefetch_depth", type=int, default=2,
                   help="device-ready batches prefetched on a background "
                        "thread (utils/prefetch.py); 0 disables")
    add_memguard_args(p)


def add_wan_model_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--use_wan", type=int, default=1)
    p.add_argument("--wan_dim", type=int, default=1536)
    p.add_argument("--wan_layers", type=int, default=30)
    p.add_argument("--wan_heads", type=int, default=12)
    p.add_argument("--wan_ffn", type=int, default=8960)
    p.add_argument("--attn_mode", type=str, default="sla",
                   choices=["dense", "sla", "sage_sla"],
                   help="sage_sla: int8-quantized Q/K block-sparse kernel "
                        "(reference SageSparseLinearAttention analogue)")
    p.add_argument("--sla_topk", type=float, default=0.1)
    p.add_argument("--sla_block", type=int, default=256)
    p.add_argument("--lora_rank", type=int, default=8)
    p.add_argument("--lora_alpha", type=float, default=16.0)
    p.add_argument("--lora_targets", type=str, default="attn,ffn",
                   help="comma set of {attn, ffn}; attn-only halves the "
                        "merged-weight HBM footprint")
    p.add_argument("--lora_form", type=str, default="runtime",
                   choices=["runtime", "merged"],
                   help="runtime: y += (α/r)(x·A)B inside each Dense, no "
                        "merged weight copy (fits full-length Phase-1 in "
                        "16 GB); merged: W' = W + α/r·A·B adapter-tree "
                        "(reference form)")
    p.add_argument("--ffn_mode", type=str, default="dense",
                   choices=["dense", "moe"],
                   help="moe: Switch top-1 expert FFN per block "
                        "(models/moe.py; shard experts via parallel/ep.py)")
    p.add_argument("--n_experts", type=int, default=8)
    p.add_argument("--capacity_factor", type=float, default=1.25)
    p.add_argument("--use_remat", type=int, default=1)
    p.add_argument("--layer_mode", type=str, default="scan",
                   choices=["loop", "scan"],
                   help="scan: lax.scan over stacked block params — one "
                        "compiled block, bwd activation memory bounded to "
                        "one block (fits Phase-1 full mode in 16 GB); "
                        "loop: unrolled block_{i} params (reference-like)")
    p.add_argument("--wan_pretrained", type=str, default=None,
                   help="path to a diffusers Wan2.1 transformer checkpoint "
                        "(directory of .safetensors or one file); converted "
                        "host-side into the frozen base (reference "
                        "wan_backbone.py from_pretrained equivalent)")
    p.add_argument("--frame_cond", type=int, default=1)
    p.add_argument("--frame_cond_dim", type=int, default=5)
    p.add_argument("--patch_size", type=int, default=2)


class _StatefulIter:
    """next()-able view of a BatchLoader that exposes its resume marker."""

    def __init__(self, loader):
        self._loader = loader
        self._it = iter(loader)

    @property
    def state(self):
        return self._loader.state

    def __iter__(self):
        return self

    def __next__(self):
        return next(self._it)


def make_wansynth_loader(args, seed: int, state: Optional[dict] = None):
    """Build the streaming batch loader; `state` (a previous loader's
    `.state`) resumes the data stream where a checkpoint left it. Both
    returned iterator kinds expose `.state` (JSON-able) for checkpoint meta.
    With the device prefetcher in front, the marker can run ahead of the
    consumed position by the prefetch depth — resume then skips (never
    repeats) at most that many batches."""
    from ..parallel.multihost import maybe_initialize_distributed

    # pod-scale runs: wire the processes into one logical runtime before any
    # device access, so the tar dataset's split_by_process sees the real
    # process_index/count; single-process this is a no-op
    maybe_initialize_distributed()
    if args.data == "tar":
        if not args.data_root:
            raise ValueError("--data_root required for --data tar")
        ds = WanSynthTarDataset(args.data_root, T=args.T, seed=seed,
                                anchors_root=args.anchors_root)
        return ds.batches(args.batch, state=state)
    if getattr(args, "anchors_root", None):
        raise ValueError(
            "--anchors_root joins are defined over tar shards; with synthetic "
            "data, materialize it first (python -m interpolated_diffusion_tpu"
            ".data.make_synth_tars) and pass --data tar --data_root <dir> — "
            "otherwise anchors would be silently ignored"
        )
    ds = SyntheticWanDataset(
        n_samples=args.num_samples, T=args.T, C=args.latent_c,
        H=args.latent_h, W=args.latent_w, text_len=args.text_len,
        text_dim=args.text_dim, seed=seed,
    )
    return _StatefulIter(BatchLoader(
        ds, batch_size=args.batch, seed=seed,
        start_batch=int((state or {}).get("batches", 0))))


def _lora_form(args) -> str:
    return str(getattr(args, "lora_form", "merged"))


# WanDiT head-modulation semantics version. "t_emb" = final-layer scale/shift
# table modulated by the raw time embedding (diffusers-Wan semantics, required
# for pretrained-weight compatibility). Checkpoints written before this stamp
# existed were trained under the older t_mod[:, :2] semantics and would be
# silently mis-evaluated by the current forward — check_wan_meta flags them.
WAN_HEAD_MOD_VERSION = "t_emb"


def check_wan_meta(meta: Dict) -> None:
    """Warn when a Wan checkpoint predates the head-modulation fix.

    Call after reading the meta of any checkpoint trained with ``use_wan``.
    """
    import warnings

    if not meta.get("use_wan"):
        return
    ver = meta.get("wan_head_mod")
    if ver is None:
        warnings.warn(
            "Wan checkpoint meta carries no 'wan_head_mod' stamp — it was "
            "trained before the head-modulation change (t_mod[:, :2] -> "
            "t_emb). Sampling with the current WanDiT forward will apply "
            "mismatched head-modulation semantics to this checkpoint.",
            stacklevel=2,
        )
    elif ver != WAN_HEAD_MOD_VERSION:
        raise ValueError(
            f"Wan checkpoint head-modulation version {ver!r} is incompatible "
            f"with this build ({WAN_HEAD_MOD_VERSION!r})."
        )


def build_wan(args, bf16: bool = True) -> WanDiT:
    # runtime-form LoRA lives INSIDE the model (LoRADense); merged form keeps
    # a plain-Dense model and merges the adapter tree outside.
    runtime_rank = (args.lora_rank
                    if _lora_form(args) == "runtime" and args.lora_rank > 0
                    else 0)
    return WanDiT(
        dim=args.wan_dim, n_layers=args.wan_layers, n_heads=args.wan_heads,
        ffn_dim=args.wan_ffn, in_channels=args.latent_c,
        out_channels=args.latent_c, text_dim=args.text_dim,
        attn_mode=args.attn_mode, sla_topk=args.sla_topk,
        sla_block=args.sla_block,
        lora_rank=runtime_rank, lora_alpha=args.lora_alpha,
        lora_targets=str(getattr(args, "lora_targets", "attn,ffn")),
        ffn_mode=str(getattr(args, "ffn_mode", "dense")),
        n_experts=int(getattr(args, "n_experts", 8)),
        capacity_factor=float(getattr(args, "capacity_factor", 1.25)),
        use_remat=bool(args.use_remat),
        layer_mode=str(getattr(args, "layer_mode", "loop")),
        dtype=jnp.bfloat16 if bf16 else jnp.float32,
    )


def load_pretrained_into(wan_params: Dict, args) -> Dict:
    """Overwrite the base weights of an initialized WanDiT param tree with a
    converted pretrained checkpoint (--wan_pretrained). LoRA leaves and any
    params absent from the checkpoint keep their init values; every
    checkpoint leaf must match an existing path + shape."""
    if not getattr(args, "wan_pretrained", None):
        return wan_params
    from ..models.wan_convert import load_wan_safetensors

    pre = load_wan_safetensors(
        args.wan_pretrained, layer_mode=str(getattr(args, "layer_mode", "loop"))
    )
    flat = dict(traverse_util.flatten_dict(wan_params))
    n_loaded = 0
    for k, v in traverse_util.flatten_dict(pre).items():
        if k not in flat:
            raise ValueError(f"pretrained param {'/'.join(k)} not in model")
        if tuple(flat[k].shape) != tuple(v.shape):
            raise ValueError(
                f"shape mismatch at {'/'.join(k)}: model {flat[k].shape} "
                f"vs checkpoint {v.shape}"
            )
        flat[k] = jnp.asarray(v, dtype=flat[k].dtype)
        n_loaded += 1
    print(f"loaded {n_loaded} pretrained tensors from {args.wan_pretrained}")
    return traverse_util.unflatten_dict(flat)


_LORA_LEAVES = ("lora_A", "lora_B")


def split_lora_params(wan_params) -> Tuple[Dict, Dict]:
    """Partition a runtime-LoRA param tree into (lora leaves, frozen rest).

    Structural only — no tensor math, no copies. The frozen rest has exactly
    the param paths of a lora_rank=0 WanDiT, so plain base checkpoints
    interchange with it. Reference: src/models/lora.py
    mark_only_lora_trainable (requires_grad masking), realized here as a
    tree partition consumed by make_train_step_frozen.
    """
    flat = traverse_util.flatten_dict(wan_params)
    tr = {k: v for k, v in flat.items() if k[-1] in _LORA_LEAVES}
    fr = {k: v for k, v in flat.items() if k[-1] not in _LORA_LEAVES}
    return traverse_util.unflatten_dict(tr), traverse_util.unflatten_dict(fr)


def join_lora_params(lora_tree: Dict, base: Dict) -> Dict:
    """Inverse of split_lora_params — dict-union of the two partitions."""
    flat = dict(traverse_util.flatten_dict(base))
    flat.update(traverse_util.flatten_dict(lora_tree))
    return traverse_util.unflatten_dict(flat)


def init_wan_trainables(
    key: jax.Array, args, wan_params, bf16: bool = True
) -> Tuple[Dict, Optional[FrameCondProjector], None]:
    """Returns (params tree, frame_cond module, None).

    With lora_rank > 0 the Wan weights live in the tree as "wan_base" — a
    FROZEN optimizer partition (optax.multi_transform via
    frozen_label_fn) so they flow through the jitted step as a donated
    argument, never as a multi-GB captured constant. Only {lora, frame_cond}
    receive updates (reference mark_only_lora_trainable semantics).
    """
    k_lora, k_fc = jax.random.split(key)
    trainable: Dict = {}
    fc_module = None
    if args.frame_cond:
        fc_module = FrameCondProjector(
            feat_dim=args.frame_cond_dim, text_dim=args.text_dim,
            dtype=jnp.bfloat16 if bf16 else jnp.float32,
        )
        trainable["frame_cond"] = fc_module.init(
            k_fc, jnp.zeros((1, args.T, args.frame_cond_dim))
        )["params"]
    dt = jnp.bfloat16 if bf16 else jnp.float32
    if args.lora_rank > 0 and _lora_form(args) == "runtime":
        # wan_params came from a LoRADense model: lora_A/lora_B leaves are
        # already in the tree. Split structurally; A/B stay f32 masters,
        # the frozen rest drops to compute dtype (no f32 copy needed).
        lora_tree, rest = split_lora_params(wan_params)
        trainable["lora"] = lora_tree
        base = jax.tree_util.tree_map(lambda x: x.astype(dt), rest)
    elif args.lora_rank > 0:
        targets = {t.strip() for t in
                   str(getattr(args, "lora_targets", "attn,ffn")).split(",")}
        pats = []
        if "attn" in targets:
            pats.append("q_proj|k_proj|v_proj|o_proj")
        if "ffn" in targets:
            pats.append("ffn_in|ffn_out")
        trainable["lora"] = init_lora(
            k_lora, wan_params, args.lora_rank, args.lora_alpha,
            filter_regex="(" + "|".join(pats) + ")",
        )
        # the frozen base needs no f32 master copy — store in compute dtype
        # (halves HBM at 1.3B scale: 5.7 GB → 2.9 GB, and the LoRA-merged
        # copy shrinks the same way)
        base = jax.tree_util.tree_map(lambda x: x.astype(dt), wan_params)
    else:
        trainable["wan"] = wan_params
        base = None
    return trainable, fc_module, base


def merged_wan_params(params: Dict, base, args):
    """Effective Wan params: frozen base + LoRA delta, or the full tree.

    `base` is the NON-differentiated frozen tree passed as a plain step
    argument (make_train_step_frozen) — never a jit constant, never a
    zero-gradient allocation.
    """
    if args.lora_rank > 0:
        if _lora_form(args) == "runtime":
            return join_lora_params(params["lora"], base)
        return apply_lora(base, params["lora"], args.lora_rank, args.lora_alpha)
    return params["wan"]


def midpoint_indices(idx: jnp.ndarray) -> jnp.ndarray:
    return (idx[:, :-1] + idx[:, 1:]) // 2


def meanpool_between_anchors(tokens: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Mean of strictly-interior frames per segment ([B,K-1,N,D]); midpoint
    frame when the gap has no interior."""
    B, T, N, D = tokens.shape
    csum = jnp.cumsum(tokens, axis=1)
    csum = jnp.concatenate([jnp.zeros_like(csum[:, :1]), csum], axis=1)  # [B,T+1,...]
    i = idx[:, :-1]
    j = idx[:, 1:]
    upper = jnp.take_along_axis(csum, j[..., None, None], axis=1)        # sum up to j-1
    lower = jnp.take_along_axis(csum, (i + 1)[..., None, None], axis=1)  # sum up to i
    interior = (j - i - 1)[..., None, None].astype(tokens.dtype)
    mean = (upper - lower) / jnp.maximum(interior, 1.0)
    mid = jnp.take_along_axis(tokens, midpoint_indices(idx)[..., None, None], axis=1)
    return jnp.where(interior > 0, mean, mid)
