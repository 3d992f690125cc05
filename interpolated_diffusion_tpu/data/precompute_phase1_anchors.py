"""Precompute Phase-1 anchors: DDIM-sample Wan keyframes into tar shards.

Parity with reference scripts/datasets/precompute_phase1_anchors.py (549 LoC):
loads a Phase-1 (keypoints_wansynth) checkpoint, DDIM-samples the K anchor
frames per clip (short mode with absolute-time RoPE), and writes
`{key}.anchors.npy` + `{key}.anchor_idx.npy` shards keyed to the input stream
— the Phase-2 trainer joins them back via --anchors_root.
"""
from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..models.video_denoisers import VideoTokenKeypointDenoiser
from ..ops.ddpm import ddim_scan, make_timesteps
from ..ops.keyframes import sample_fixed_k_indices_uniform_batch
from ..ops.schedules import make_schedule
from ..utils.checkpoint import read_meta, load_checkpoint
from ..utils.video_tokens import patchify_latents, unpatchify_tokens
from ..models.loading import resolve_ckpt
from .wan_synth import SyntheticWanDataset, write_tar_shard


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("precompute_phase1_anchors (TPU)")
    p.add_argument("--ckpt", type=str, required=True)
    p.add_argument("--out_root", type=str, required=True)
    p.add_argument("--data", type=str, default="synthetic", choices=["synthetic", "tar"])
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--num_samples", type=int, default=64)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--shard_size", type=int, default=64)
    p.add_argument("--ddim_steps", type=int, default=4)
    p.add_argument("--solver", type=str, default="ddim",
                   choices=["ddim", "pfdiff", "dpm"],
                   help="pfdiff: ~half the model evals per anchor; dpm: "
                        "DPM-Solver++(2M) 2nd-order accuracy per eval. Both "
                        "mutually exclusive with --cache_interval > 1")
    p.add_argument("--cache_interval", type=int, default=1,
                   help="FORA-style block caching (arXiv 2407.01425): run the "
                        "Wan block stack every Nth DDIM step and reuse its "
                        "residual in between (embed/cond/head stay fresh). "
                        "1 = exact; 2-3 trades small anchor error for ~N× "
                        "fewer block-stack evaluations. use_wan only.")
    p.add_argument("--attn_mode", type=str, default=None,
                   choices=["dense", "flash", "sla", "sage_sla"],
                   help="override the checkpoint's attention mode for "
                        "sampling (e.g. sage_sla for the fastest precompute "
                        "— attention weights are mode-agnostic)")
    p.add_argument("--sla_topk", type=float, default=None)
    p.add_argument("--sla_topk_schedule", type=str, default="",
                   help="timestep-adaptive sparsity (arXiv 2603.19939 "
                        "spirit): 'frac:topk,frac:topk' — e.g. "
                        "'0.5:0.05,1.0:0.1' runs the first half of the "
                        "(high-noise) DDIM steps at topk 0.05 and the rest "
                        "at 0.1. One compiled scan per segment; sla/"
                        "sage_sla + use_wan only")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bf16", type=int, default=1)
    return p


def parse_topk_schedule(spec: str):
    """'0.5:0.05,1.0:0.1' → [(0.5, 0.05), (1.0, 0.1)] (validated)."""
    if not spec:
        return None
    segs = []
    for part in spec.split(","):
        frac, tk = part.split(":")
        segs.append((float(frac), float(tk)))
    if any(b[0] <= a[0] for a, b in zip(segs, segs[1:])):
        raise ValueError(f"schedule fractions must increase: {spec}")
    if abs(segs[-1][0] - 1.0) > 1e-6:
        raise ValueError(f"schedule must end at frac 1.0: {spec}")
    return segs


def main(argv=None):
    args = build_argparser().parse_args(argv)
    path = resolve_ckpt(args.ckpt)
    _, meta = read_meta(path)
    if meta.get("stage") != "keypoints_wansynth":
        raise ValueError(f"{path} is not a Phase-1 wansynth checkpoint")
    T, K = int(meta["T"]), int(meta["K"])
    C, H, W = int(meta["latent_c"]), int(meta["latent_h"]), int(meta["latent_w"])
    p_sz = int(meta["patch_size"])
    spatial = (H // p_sz, W // p_sz)
    N = spatial[0] * spatial[1]
    D_tok = C * p_sz * p_sz
    schedule = make_schedule(meta["schedule"], int(meta["N_train"]))
    times = jnp.asarray(make_timesteps(int(meta["N_train"]), args.ddim_steps, "quadratic"))

    if meta.get("use_wan"):
        from ..train.wansynth_common import build_wan, merged_wan_params
        from ..models.wan_dit import FrameCondProjector
        from ..utils.frame_features import frame_features_from_mask

        class _A:  # namespace for build_wan
            pass

        a = _A()
        for k_, v_ in dict(
            wan_dim=meta["wan_dim"], wan_layers=meta["wan_layers"],
            wan_heads=meta["wan_heads"], wan_ffn=meta["wan_ffn"],
            latent_c=C, text_dim=meta["text_dim"],
            attn_mode=args.attn_mode or meta["attn_mode"],
            sla_topk=(args.sla_topk if args.sla_topk is not None
                      else meta["sla_topk"]),
            sla_block=128, use_remat=0,
            lora_rank=meta["lora_rank"], lora_alpha=meta["lora_alpha"],
            lora_form=meta.get("lora_form", "merged"),
            lora_targets=meta.get("lora_targets", "attn,ffn"),
            layer_mode=meta.get("layer_mode", "loop"),
            ffn_mode=meta.get("ffn_mode", "dense"),
            n_experts=meta.get("n_experts", 8),
            capacity_factor=meta.get("capacity_factor", 1.25),
            frame_cond=meta["frame_cond"], frame_cond_dim=5, T=T,
        ).items():
            setattr(a, k_, v_)
        wan = build_wan(a, bool(args.bf16))
        L_in = K
        base = wan.init(
            jax.random.PRNGKey(0), jnp.zeros((1, C, L_in, H, W)),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1, 8, meta["text_dim"])),
            jnp.zeros((1, L_in), jnp.int32),
            jnp.zeros((1, L_in, meta["text_dim"])) if meta["frame_cond"] else None,
        )["params"]
        from ..train.wansynth_common import init_wan_trainables

        trainable0, fc_module, base_params = init_wan_trainables(
            jax.random.PRNGKey(0), a, base, bool(args.bf16))
        tmpl = dict(trainable0)
        if base_params is not None:
            tmpl["wan_base"] = base_params
        _, payload = load_checkpoint(path, tmpl)
        trainable = {k: v for k, v in payload["params"].items() if k != "wan_base"}
        base_params = payload["params"].get("wan_base", base_params)

        def make_eps(wan_model):
            def eps_fn(z_t_tokens, t, idx, text, blocks_delta=None,
                       return_delta=False):
                extra = None
                if meta["frame_cond"]:
                    B = z_t_tokens.shape[0]
                    mask = jnp.zeros((B, T), dtype=bool).at[
                        jnp.arange(B)[:, None], idx].set(True)
                    feat = jnp.take_along_axis(
                        frame_features_from_mask(mask), idx[..., None], axis=1)
                    extra = fc_module.apply(
                        {"params": trainable["frame_cond"]}, feat)
                wparams = merged_wan_params(trainable, base_params, a)
                lat_in = jnp.transpose(
                    unpatchify_tokens(z_t_tokens, p_sz, spatial),
                    (0, 2, 1, 3, 4))
                pred = wan_model.apply(
                    {"params": wparams}, lat_in, t, text, idx, extra,
                    blocks_delta=blocks_delta, return_delta=return_delta)
                if return_delta:
                    pred, delta = pred
                out, _ = patchify_latents(
                    jnp.transpose(pred, (0, 2, 1, 3, 4)), p_sz)
                return (out, delta) if return_delta else out

            return eps_fn

        eps_fn = make_eps(wan)
        # timestep-adaptive sparsity: one model VARIANT per topk value — the
        # params are identical (topk is a module attribute, not a weight),
        # only the compiled LUT width changes per segment
        topk_schedule = parse_topk_schedule(args.sla_topk_schedule)
        seg_eps = None
        if topk_schedule:
            if a.attn_mode not in ("sla", "sage_sla"):
                raise ValueError("--sla_topk_schedule needs attn_mode "
                                 "sla/sage_sla")
            seg_eps = []
            for frac, tk in topk_schedule:
                a_i = _A()
                for k_ in vars(a):
                    setattr(a_i, k_, getattr(a, k_))
                a_i.sla_topk = tk
                seg_eps.append((frac, make_eps(build_wan(a_i, bool(args.bf16)))))

        # wan-internal token count/dim for the cached block residual (NOT the
        # outer meta["patch_size"] token patching — this is WanDiT's own)
        wpt, wph, wpw = wan.patch_size
        cache_shape = (L_in // wpt) * (H // wph) * (W // wpw), int(meta["wan_dim"])
    else:
        tok_model = VideoTokenKeypointDenoiser(
            d_model=meta["d_model"], n_layers=meta["n_layers"],
            n_heads=meta["n_heads"], d_ff=meta["d_ff"], data_dim=D_tok,
            use_start_goal=False,
            dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        )
        tmpl = tok_model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, K, N, D_tok)),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1, K), jnp.int32),
            {"text_embed": jnp.zeros((1, 8, meta["text_dim"]))}, T, spatial,
        )["params"]
        _, payload = load_checkpoint(path, tmpl)
        params = payload.get("ema") or payload["params"]

        def eps_fn(z_t_tokens, t, idx, text):
            return tok_model.apply({"params": params}, z_t_tokens, t, idx,
                                   {"text_embed": text}, T, spatial)

        seg_eps = None
        if args.sla_topk_schedule:
            raise ValueError("--sla_topk_schedule needs a use_wan checkpoint")

    interval = max(1, int(args.cache_interval))
    if interval > 1 and not meta.get("use_wan"):
        raise ValueError("--cache_interval > 1 needs a use_wan checkpoint "
                         "(block caching lives in the WanDiT forward)")
    if interval > 1 and args.solver == "pfdiff":
        raise ValueError("--solver pfdiff and --cache_interval > 1 both "
                         "substitute model evals — pick one")

    # segment the timestep grid: [(seg_times, eps_fn)] — one entry (the whole
    # grid) without a schedule; contiguous overlapping slices per topk with
    # one. Each segment is a separate statically-shaped scan in the SAME jit.
    S_int = int(times.shape[0]) - 1
    if seg_eps:
        bounds, prev = [], 0
        for frac, fn in seg_eps:
            hi = min(S_int, max(prev, round(frac * S_int)))
            if hi > prev:
                bounds.append((prev, hi, fn))
            prev = hi
        segments = [(times[lo:hi + 1], fn) for lo, hi, fn in bounds]
    else:
        segments = [(times, eps_fn)]

    @jax.jit
    def sample_anchors(key, idx, text):
        B = idx.shape[0]
        z = jax.random.normal(key, (B, K, N, D_tok))

        for seg_times, seg_fn in segments:
            def scan_eps(z, t_b, blocks_delta=None, return_delta=False,
                         _fn=seg_fn):
                return _fn(z.astype(jnp.float32), t_b, idx, text,
                           blocks_delta, return_delta) \
                    if meta.get("use_wan") \
                    else _fn(z.astype(jnp.float32), t_b, idx, text)

            from ..ops.ddpm import run_solver

            delta0 = None
            if interval > 1:
                dt_ = jnp.bfloat16 if args.bf16 else jnp.float32
                delta0 = jnp.zeros((B, *cache_shape), dt_)
            z, _ = run_solver(args.solver, scan_eps, z, seg_times, schedule,
                              cache_interval=interval, delta0=delta0)
        return unpatchify_tokens(z, p_sz, spatial)   # [B,K,C,H,W]

    # Output shards MIRROR the source shard basenames: the trainer-side
    # key-join (wan_synth.py WanSynthTarDataset._stream) pairs each data shard
    # with `anchors_root/<same basename>`, which also keeps the join aligned
    # when shard order is shuffled. Synthetic data has no source shards and
    # CANNOT be joined downstream (make_wansynth_loader raises) — materialize
    # it with data/make_synth_tars.py first and run this tool in tar mode;
    # the synthetic branch stays for standalone anchor inspection only.
    if args.data == "tar":
        from .wan_synth import iter_tar_samples, list_shards

        def shard_groups():
            for sh in list_shards(args.data_root):
                yield os.path.basename(sh), iter_tar_samples(sh)
    else:
        ds = SyntheticWanDataset(n_samples=args.num_samples, T=T, C=C, H=H, W=W,
                                 text_dim=int(meta["text_dim"]), seed=args.seed)

        def shard_groups():
            for shard_id, lo in enumerate(range(0, args.num_samples, args.shard_size)):
                idxs = range(lo, min(args.num_samples, lo + args.shard_size))
                yield (f"anchors_{shard_id:05d}.tar",
                       iter({"__key__": f"{i:08d}", **ds.get(i)} for i in idxs))

    def batched(it):
        items = []
        for s in it:
            items.append(s)
            if len(items) == args.batch:
                yield items
                items = []
        if items:
            yield items

    key = jax.random.PRNGKey(args.seed)
    done, n_shards = 0, 0
    # steady-state throughput telemetry (the reference logs exactly this for
    # its precompute runs, notes/PROJECT_LOG.md:552-555,:627-629 — where
    # SageSLA earned its 2.6×): first batch carries the jit compile, so the
    # clock starts after it
    t_start, n_timed = None, 0
    os.makedirs(args.out_root, exist_ok=True)
    for out_name, sample_iter in shard_groups():
        out_samples = []
        for items in batched(sample_iter):
            B = len(items)
            key, k_idx, k_s = jax.random.split(key, 3)
            idx, _ = sample_fixed_k_indices_uniform_batch(
                k_idx, B, T, K, ensure_endpoints=False, jitter=0.5)
            text = jnp.stack([jnp.asarray(it["text_embed"]) for it in items])
            anchors = np.asarray(sample_anchors(k_s, idx, text))
            idx_np = np.asarray(idx)
            if t_start is None:
                t_start = time.time()   # post-compile
            else:
                n_timed += B
            for b, it in enumerate(items):
                out_samples.append({
                    "__key__": it["__key__"],
                    "anchors": anchors[b].astype(np.float32),
                    "anchor_idx": idx_np[b].astype(np.int32),
                })
            done += B
            print(f"anchored {done} samples")
        if out_samples:
            write_tar_shard(os.path.join(args.out_root, out_name), out_samples)
            n_shards += 1
    sps = (n_timed / (time.time() - t_start)
           if t_start is not None and n_timed else None)
    if sps:
        print(f"steady-state throughput: {sps:.3f} samples/s "
              f"(excl. first/compile batch)")
    with open(os.path.join(args.out_root, "prep_config.json"), "w") as f:
        json.dump({"args": vars(args), "meta": meta,
                   "samples_per_sec": sps}, f, indent=2, default=str)
    print(f"wrote {n_shards} shards to {args.out_root}")


if __name__ == "__main__":
    main()
