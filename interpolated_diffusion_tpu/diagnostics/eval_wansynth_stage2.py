"""Stage-2 (Phase-2) wansynth eval: refined-vs-lerp latent MSE.

The video-path analogue of sample/generate.py's interp/refined/oracle
comparison (reference evaluates Phase-2 through its trainer val loop,
src/train/train_interp_levels_wansynth.py:452-529): loads a Phase-2
checkpoint, joins the data stream with the Phase-1 anchor shards, and runs
the level-loop refinement from the coarsest interpolation, reporting latent
token MSE for

  {gt, p1} anchors x {lerp, refined}   + p1 anchor-slot MSE

where `gt` gathers ground-truth anchor frames (the oracle upper bound) and
`p1` uses the precomputed Phase-1 DDIM anchors — the production path. A
working Stage-2 must move `refined` below `lerp` at the same anchors.
Writes summary.json (+ archived evidence) like every sampler.
"""
from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..models.video_denoisers import VideoTokenInterpLevelDenoiser
from ..ops.keyframes import build_nested_masks_from_base
from ..ops.video_keyframes import interpolate_video_from_indices
from ..utils.checkpoint import load_checkpoint, read_meta
from ..utils.frame_features import frame_features_from_mask
from ..utils.video_tokens import patchify_latents, unpatchify_tokens
from ..models.loading import resolve_ckpt


def _ns(meta, args):
    """Meta -> args namespace for build_wan/init_wan_trainables (the same
    reconstruction the anchor precompute does, precompute_phase1_anchors)."""
    fc_dim = 6 + (1 if meta.get("mode", "adj") == "adj" else 0)
    return argparse.Namespace(
        wan_dim=meta["wan_dim"], wan_layers=meta["wan_layers"],
        wan_heads=meta["wan_heads"], wan_ffn=meta["wan_ffn"],
        latent_c=meta["latent_c"], text_dim=meta["text_dim"],
        attn_mode=meta["attn_mode"],
        sla_topk=meta.get("sla_topk", 0.1), sla_block=meta.get("sla_block", 256),
        use_remat=0, lora_rank=meta["lora_rank"], lora_alpha=meta["lora_alpha"],
        lora_form=meta.get("lora_form", "merged"),
        lora_targets=meta.get("lora_targets", "attn,ffn"),
        layer_mode=meta.get("layer_mode", "loop"),
        ffn_mode=meta.get("ffn_mode", "dense"),
        n_experts=meta.get("n_experts", 8),
        capacity_factor=meta.get("capacity_factor", 1.25),
        frame_cond=1, frame_cond_dim=fc_dim, T=meta["T"],
    )


def build_argparser():
    p = argparse.ArgumentParser("eval_wansynth_stage2 (TPU)")
    p.add_argument("--p2_ckpt", type=str, required=True)
    p.add_argument("--p1_ckpt", type=str, default=None,
                   help="unused (anchors come from --anchors_root); kept so "
                        "pipelines can record the provenance pair")
    p.add_argument("--data", type=str, default="tar")
    p.add_argument("--data_root", type=str, required=True)
    p.add_argument("--anchors_root", type=str, required=True)
    p.add_argument("--T", type=int, default=21)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--num_batches", type=int, default=8)
    p.add_argument("--bf16", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out_dir", type=str, default="runs/eval_wansynth_stage2")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    path = resolve_ckpt(args.p2_ckpt)
    _, meta = read_meta(path)
    if meta.get("stage") != "interp_levels_wansynth":
        raise ValueError(f"{path} is not a Phase-2 checkpoint")
    T = int(meta["T"])
    levels, K_min = int(meta["levels"]), int(meta["K_min"])
    mode = meta.get("mode", "adj")
    p_sz = int(meta["patch_size"])
    use_wan = bool(meta.get("use_wan"))
    C, H, W = (int(meta[k]) for k in ("latent_c", "latent_h", "latent_w"))
    spatial = (H // p_sz, W // p_sz)
    N = spatial[0] * spatial[1]
    D_tok = C * p_sz * p_sz
    level_t_scale = int(meta.get("level_t_scale", 100))
    mask_channels = int(meta["mask_channels"])

    mns = _ns(meta, args)  # namespace carrying the wan model dims from meta
    if use_wan:
        from ..train.wansynth_common import (
            build_wan, check_wan_meta, init_wan_trainables, merged_wan_params,
        )
        check_wan_meta(meta)
        wan = build_wan(mns, bool(args.bf16))
        k0 = jax.random.PRNGKey(0)
        tmpl = wan.init(
            k0, jnp.zeros((1, C, T, H, W)), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 8, mns.text_dim)), None,
            jnp.zeros((1, T, mns.text_dim)),
        )["params"]
        trainable, fc_module, base0 = init_wan_trainables(
            k0, mns, tmpl, bool(args.bf16))
        tmpl_tree = dict(trainable)
        if base0 is not None:
            tmpl_tree["wan_base"] = base0
        _, payload = load_checkpoint(path, tmpl_tree)
        params = payload["params"]
        base = params.pop("wan_base", None)
        wparams = merged_wan_params(params, base, mns)
        fc_params = params["frame_cond"]
    else:
        tok_model = VideoTokenInterpLevelDenoiser(
            d_model=int(meta["d_model"]), n_layers=int(meta["n_layers"]),
            n_heads=int(meta["n_heads"]), d_ff=int(meta["d_ff"]),
            data_dim=D_tok, use_start_goal=False,
            max_levels=max(8, levels), mask_channels=mask_channels,
            dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        )
        tmpl = tok_model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, T, N, D_tok)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, T, N, mask_channels)),
            {"text_embed": jnp.zeros((1, 8, int(meta["text_dim"])))}, spatial,
        )["params"]
        _, payload = load_checkpoint(path, tmpl)
        params = payload["params"]

    def apply_level(x_tok, s, mask_s, mask_prev, conf, text):
        """One adj refinement step: x_{s-1} = x_s + delta_hat."""
        B = x_tok.shape[0]
        s_b = jnp.full((B,), s * (level_t_scale if use_wan else 1), jnp.int32)
        if use_wan:
            feats = [frame_features_from_mask(mask_s), conf[..., None]]
            if mode == "adj":
                feats.append(mask_prev[..., None].astype(jnp.float32))
            feat = jnp.concatenate(feats, axis=-1)
            extra = fc_module.apply({"params": fc_params}, feat)
            lat = jnp.transpose(unpatchify_tokens(x_tok, p_sz, spatial),
                                (0, 2, 1, 3, 4))
            pred = wan.apply({"params": wparams}, lat, s_b, text, None, extra)
            delta, _ = patchify_latents(
                jnp.transpose(pred, (0, 2, 1, 3, 4)), p_sz)
        else:
            mt = jnp.broadcast_to(mask_s[:, :, None], (B, T, N))
            chans = [mt.astype(jnp.float32)]
            if mode == "adj":
                mp = jnp.broadcast_to(mask_prev[:, :, None], (B, T, N))
                chans.append(mp.astype(jnp.float32))
            chans.append(jnp.broadcast_to(conf[:, :, None], (B, T, N)))
            mask_in = jnp.stack(chans, axis=-1)
            delta = tok_model.apply({"params": params}, x_tok,
                                    jnp.full((B,), s, jnp.int32), mask_in,
                                    {"text_embed": text}, spatial)
        return x_tok + delta

    @jax.jit
    def run(key, latents, text, anchors, anchor_idx):
        tokens, _ = patchify_latents(latents, p_sz)               # [B,T,N,D]
        a_tok, _ = patchify_latents(anchors, p_sz)                # [B,K,N,D]
        idx = anchor_idx.astype(jnp.int32)
        gt_vals = jnp.take_along_axis(tokens, idx[:, :, None, None], axis=1)
        masks_levels, _ = build_nested_masks_from_base(
            key, idx, T, levels, k_schedule=meta.get("k_schedule", "doubling"))

        B = tokens.shape[0]
        flat = lambda z: z.reshape(B, T if z.shape[1] == T else z.shape[1], -1)
        unflat = lambda z: z.reshape(B, T, N, D_tok)

        out = {}
        out["anchor_mse_p1"] = ((a_tok - gt_vals) ** 2).mean()
        for name, vals, conf_a in (("gt", gt_vals, 0.95), ("p1", a_tok, 0.5)):
            lerp = unflat(interpolate_video_from_indices(
                idx, flat(vals), T))
            x = lerp
            for s in range(levels, 0, -1):
                mask_s = masks_levels[:, s]
                mask_prev = masks_levels[:, s - 1]
                conf = jnp.where(mask_s, conf_a, 0.0).astype(jnp.float32)
                x = apply_level(x, s, mask_s, mask_prev, conf, text)
            out[f"lerp_{name}_mse"] = ((lerp - tokens) ** 2).mean()
            out[f"refined_{name}_mse"] = ((x - tokens) ** 2).mean()
        return out

    from ..train.wansynth_common import make_wansynth_loader

    dns = argparse.Namespace(
        data=args.data, data_root=args.data_root, T=args.T,
        anchors_root=args.anchors_root, batch=args.batch,
        num_samples=10**9, latent_c=C, latent_h=H, latent_w=W,
        text_len=8, text_dim=int(meta["text_dim"]))
    loader = make_wansynth_loader(dns, args.seed)
    key = jax.random.PRNGKey(args.seed)
    agg: dict = {}
    t0, n = time.time(), 0
    for bi in range(args.num_batches):
        batch = next(loader)
        key, k_b = jax.random.split(key)
        out = run(k_b, jnp.asarray(batch["latents"]),
                  jnp.asarray(batch["text_embed"]),
                  jnp.asarray(batch["anchors"]),
                  jnp.asarray(batch["anchor_idx"]))
        n += batch["latents"].shape[0]
        for k_, v in out.items():
            agg.setdefault(k_, []).append(float(v))
        print(f"batch {bi}: " + " ".join(
            f"{k_}={float(v):.5f}" for k_, v in sorted(out.items())))
    summary = {k_: float(np.mean(v)) for k_, v in agg.items()}
    summary["samples_per_sec"] = n / max(time.time() - t0, 1e-9)
    summary["p2_ckpt"] = path
    summary["stage2_helps_gt"] = bool(
        summary["refined_gt_mse"] < summary["lerp_gt_mse"])
    summary["stage2_helps_p1"] = bool(
        summary["refined_p1_mse"] < summary["lerp_p1_mse"])
    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    from ..utils.run_config import archive_evidence, write_run_config
    write_run_config(args.out_dir, args)
    archive_evidence(args.out_dir)
    print("summary:", json.dumps(summary, indent=2))
    return summary


if __name__ == "__main__":
    main()
