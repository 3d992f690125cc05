"""Wan Phase-2 trainer: interp-level refinement on video token grids.

Capability parity with reference src/train/train_interp_levels_wansynth.py:
token interp corruption (build_video_token_interp_{level,adjacent}_batch)
with optional precomputed Phase-1 anchors joined by index (--anchors_root →
anchor_values/anchor_idx), adj (`target = z_prev − z_s`) / x0
(`target = tokens − z_s`) modes (:452, :492), conf-weighted MSE, frame-cond
features including confidence channels, Wan-DiT or token-transformer backbone
(level s drives the DiT timestep input).
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
from ..ops.video_keyframes import (
    build_video_token_interp_adjacent_batch,
    build_video_token_interp_level_batch,
)
from ..parallel.mesh import make_mesh_for_batch, replicate, shard_batch
from ..utils.checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint
from ..utils.frame_features import frame_features_from_mask
from ..utils.video_tokens import patchify_latents, unpatchify_tokens
from .state import init_train_state, make_optimizer, make_train_step
from .wansynth_common import (
    add_wan_model_args,
    add_wansynth_data_args,
    WAN_HEAD_MOD_VERSION,
    build_wan,
    check_wan_meta,
    init_wan_trainables,
    load_pretrained_into,
    make_wansynth_loader,
    merged_wan_params,
)


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("train_interp_levels_wansynth (Phase-2, TPU)")
    p.add_argument("--K_min", type=int, default=5)
    p.add_argument("--levels", type=int, default=2)
    p.add_argument("--mode", type=str, default="adj", choices=["adj", "x0"])
    p.add_argument("--interp_mode", type=str, default="linear", choices=["linear", "smooth"])
    p.add_argument("--corrupt_mode", type=str, default="gauss", choices=["none", "gauss", "dist"])
    p.add_argument("--corrupt_sigma", type=float, default=0.02)
    p.add_argument("--anchor_noise_frac", type=float, default=0.25)
    p.add_argument("--student_replace_prob", type=float, default=0.5)
    p.add_argument("--student_noise_std", type=float, default=0.02)
    p.add_argument("--w_anchor", type=float, default=1.0)
    p.add_argument("--w_missing", type=float, default=1.0)
    p.add_argument("--cond_drop_prob", type=float, default=0.0)
    p.add_argument("--level_t_scale", type=int, default=100,
                   help="DiT timestep = s * level_t_scale")
    add_wansynth_data_args(p)
    add_wan_model_args(p)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--weight_decay", type=float, default=1e-2)
    p.add_argument("--grad_accum", type=int, default=1)
    p.add_argument("--grad_clip", type=float, default=1.0)
    p.add_argument("--ema_decay", type=float, default=0.999)
    p.add_argument("--use_ema", type=int, default=0)
    p.add_argument("--bf16", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out_dir", type=str, default="runs/il_wansynth")
    p.add_argument("--save_every", type=int, default=500)
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--n_data_shards", type=int, default=None)
    p.add_argument("--d_model", type=int, default=512)
    p.add_argument("--n_layers", type=int, default=8)
    p.add_argument("--n_heads", type=int, default=8)
    p.add_argument("--d_ff", type=int, default=2048)
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    loader = make_wansynth_loader(args, args.seed)
    T = args.T
    use_wan = bool(args.use_wan)
    rng = jax.random.PRNGKey(args.seed)

    batch0 = next(loader)
    _, _, C, H, W = batch0["latents"].shape
    p_sz = args.patch_size
    N = (H // p_sz) * (W // p_sz)
    D_tok = C * p_sz * p_sz
    spatial = (H // p_sz, W // p_sz)
    # frame features: [t, is_anchor, alpha, gap, dist_mid] + conf channel
    fc_dim = 6
    mask_channels = (2 if args.mode == "adj" else 1) + 1  # + conf

    rng, k_init, k_tr = jax.random.split(rng, 3)
    if use_wan:
        args.frame_cond = 1
        args.frame_cond_dim = fc_dim + (1 if args.mode == "adj" else 0)
        wan = build_wan(args, bool(args.bf16))
        wan_params = wan.init(
            k_init, jnp.zeros((1, C, T, H, W)), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 8, args.text_dim)), None,
            jnp.zeros((1, T, args.text_dim)),
        )["params"]
        wan_params = load_pretrained_into(wan_params, args)
        trainable, fc_module, base = init_wan_trainables(k_tr, args, wan_params, bool(args.bf16))
        print(f"wan params: {sum(x.size for x in jax.tree_util.tree_leaves(wan_params))/1e6:.1f}M "
              f"| trainable: {sum(x.size for x in jax.tree_util.tree_leaves(trainable))/1e6:.3f}M")
    else:
        tok_model = VideoTokenInterpLevelDenoiser(
            d_model=args.d_model, n_layers=args.n_layers, n_heads=args.n_heads,
            d_ff=args.d_ff, data_dim=D_tok, use_start_goal=False,
            max_levels=max(8, args.levels), mask_channels=mask_channels,
            dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        )
        trainable = tok_model.init(
            k_init, jnp.zeros((1, T, N, D_tok)), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, T, N, mask_channels)),
            {"text_embed": jnp.zeros((1, 8, args.text_dim))}, spatial,
        )["params"]
        base, fc_module = None, None

    corr = dict(
        corrupt_mode=args.corrupt_mode, corrupt_sigma=args.corrupt_sigma,
        anchor_noise_frac=args.anchor_noise_frac,
        student_replace_prob=args.student_replace_prob,
        student_noise_std=args.student_noise_std,
        interp_mode=args.interp_mode, clamp_endpoints=False,
    )

    def loss_fn(params, frozen, batch, rng):
        latents = batch["latents"]
        text = batch["text_embed"]
        B = latents.shape[0]
        tokens, _ = patchify_latents(latents, p_sz)
        k_corr, k_drop = jax.random.split(rng)
        kw = dict(corr)
        if "anchors" in batch:
            kw["anchor_values"], _ = patchify_latents(batch["anchors"], p_sz)
            kw["anchor_idx"] = batch["anchor_idx"].astype(jnp.int32)
        if args.mode == "adj":
            (z_s, z_prev, mask_s, mask_prev, s_idx, masks_levels, _, conf_s,
             conf_prev) = build_video_token_interp_adjacent_batch(
                k_corr, tokens, args.K_min, args.levels, **kw)
            target = z_prev - z_s
            weight = conf_prev[..., 0] if conf_prev.ndim == 3 else conf_prev
        else:
            z_s, mask_s, s_idx, masks_levels, _, conf_s = (
                build_video_token_interp_level_batch(
                    k_corr, tokens, args.K_min, args.levels, **kw)
            )
            mask_prev = None
            target = tokens - z_s
            weight = conf_s[..., 0] if conf_s.ndim == 3 else conf_s

        if args.cond_drop_prob > 0.0:
            drop = jax.random.uniform(k_drop, (B,)) < args.cond_drop_prob
            text = jnp.where(drop[:, None, None], 0.0, text)

        if use_wan:
            # frame features + conf as extra cross-attn tokens
            fmask_s = mask_s[:, :, 0]
            feats = [frame_features_from_mask(fmask_s), conf_s[:, :, :1]]
            if args.mode == "adj":
                feats.append(mask_prev[:, :, :1].astype(jnp.float32))
            feat = jnp.concatenate(feats, axis=-1)
            extra = fc_module.apply({"params": params["frame_cond"]}, feat)
            wparams = merged_wan_params(params, frozen, args)
            lat_in = jnp.transpose(unpatchify_tokens(z_s, p_sz, spatial), (0, 2, 1, 3, 4))
            t_in = (s_idx * args.level_t_scale).astype(jnp.int32)
            pred = wan.apply({"params": wparams}, lat_in, t_in, text, None, extra)
            delta_hat, _ = patchify_latents(jnp.transpose(pred, (0, 2, 1, 3, 4)), p_sz)
        else:
            mask_in = [mask_s.astype(jnp.float32)]
            if args.mode == "adj":
                mask_in.append(mask_prev.astype(jnp.float32))
            mask_in.append(conf_s)
            mask_in = jnp.stack(mask_in, axis=-1)
            delta_hat = tok_model.apply(
                {"params": params}, z_s, s_idx, mask_in,
                {"text_embed": text}, spatial,
            )

        diff = ((delta_hat - target) ** 2).sum(axis=-1)      # [B,T,N]
        w = args.w_missing + (args.w_anchor - args.w_missing) * weight[..., None]
        w = jnp.broadcast_to(w, diff.shape)
        loss = (diff * w).sum() / (w.sum() * D_tok + 1e-8)
        return loss, {}

    mesh = make_mesh_for_batch(args.batch, n_data=args.n_data_shards)
    tx = make_optimizer(args.lr, args.weight_decay, args.grad_clip)
    state = init_train_state(trainable, tx, use_ema=bool(args.use_ema))
    start_step = 0
    if args.resume:
        path = (args.resume if os.path.exists(os.path.join(args.resume, "meta.json"))
                else latest_checkpoint(args.resume))
        if path:
            from ..utils.checkpoint import read_meta as _read_meta
            check_wan_meta(_read_meta(path)[1] or {})
            start_step, payload = load_checkpoint(path, trainable, state.opt_state)
            state = state._replace(
                step=jnp.asarray(start_step, jnp.int32), params=payload["params"],
                opt_state=payload.get("opt_state", state.opt_state),
            )
    state = replicate(state, mesh)
    from .state import make_train_step_frozen

    train_step = make_train_step_frozen(loss_fn, tx, args.ema_decay)

    meta = {
        "stage": "interp_levels_wansynth", "T": T, "K_min": args.K_min,
        "levels": args.levels, "mode": args.mode, "use_wan": args.use_wan,
        "wan_dim": args.wan_dim, "wan_layers": args.wan_layers,
        "wan_heads": args.wan_heads, "wan_ffn": args.wan_ffn,
        "attn_mode": args.attn_mode, "lora_rank": args.lora_rank,
        "lora_alpha": args.lora_alpha, "lora_form": args.lora_form,
        "lora_targets": args.lora_targets, "layer_mode": args.layer_mode,
        "ffn_mode": args.ffn_mode, "n_experts": args.n_experts,
        "capacity_factor": args.capacity_factor,
        "patch_size": p_sz, "latent_c": C, "latent_h": H, "latent_w": W,
        "text_dim": args.text_dim, "mask_channels": mask_channels,
        "level_t_scale": args.level_t_scale,
        "d_model": args.d_model, "n_layers": args.n_layers,
        "n_heads": args.n_heads, "d_ff": args.d_ff,
        "wan_head_mod": WAN_HEAD_MOD_VERSION,
    }
    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "run_config.json"), "w") as f:
        json.dump({"args": vars(args), "meta": meta}, f, indent=2)

    from ..utils.memguard import check_cpu_mem

    import itertools

    from ..utils.prefetch import DevicePrefetcher

    def _put(b):
        dev = {"latents": b["latents"], "text_embed": b["text_embed"]}
        if "anchors" in b:
            dev["anchors"] = b["anchors"]
            dev["anchor_idx"] = b["anchor_idx"]
        return shard_batch(dev, mesh)

    host_iter = itertools.chain([batch0], loader)
    dev_iter = (DevicePrefetcher(host_iter, _put, depth=args.prefetch_depth)
                if args.prefetch_depth > 0 else map(_put, host_iter))
    t_prev = time.time()
    with mesh:
        for step in range(start_step, args.steps):
            check_cpu_mem(args.max_cpu_mem_percent)
            dev = next(dev_iter)
            rng, k = jax.random.split(rng)
            state, metrics = train_step(state, base, dev, k)
            if step % args.log_every == 0:
                loss = float(metrics["loss"])
                now = time.time()
                dt = now - t_prev
                t_prev = now
                n = max(1, args.log_every if step > start_step else 1)
                print(f"step {step} loss {loss:.4f} | {dt/n:.3f}s/step "
                      f"| {args.batch*n/dt:.2f} samples/s")
            if (step + 1) % args.save_every == 0 or step + 1 == args.steps:
                to_save = dict(state.params)
                if base is not None:
                    to_save["wan_base"] = base
                save_checkpoint(os.path.join(args.out_dir, f"ckpt_{step + 1}"),
                                to_save, None, step + 1, state.ema_params, meta)
    if hasattr(dev_iter, "close"):
        dev_iter.close()   # stop the prefetch thread, free queued batches
    return state


if __name__ == "__main__":
    main()
