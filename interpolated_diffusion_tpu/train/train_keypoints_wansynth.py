"""Wan Phase-1 trainer: fine-tune a Wan-style DiT as the keypoint denoiser.

Capability parity with reference src/train/train_keypoints_wansynth.py:
patchified latents, uniform-K anchors without forced endpoints, eps
prediction at anchor slots; `phase1_input_mode` ∈ full / short_anchors /
short_midpoints / short_meanpool (:33-43) — full scatters noisy anchors into
the T-sequence and interpolates the missing frames (smooth kernel); short
modes run length-K / 2K−1 inputs with absolute-time RoPE (:477-509); SLA
attention swap (:307-317) via attn_mode="sla" (Pallas kernel); LoRA
(:331-344) as adapter-tree training with frozen base; frame-cond cross-attn
tokens (:346-363, :453-468); CFG text dropout (:448-452); anchor-slot eps MSE
(:514-529); throughput telemetry (:550-572).
"""
from __future__ import annotations

import argparse
import json
import os
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..models.video_denoisers import VideoTokenKeypointDenoiser
from ..ops.keyframes import sample_fixed_k_indices_uniform_batch
from ..ops.schedules import make_schedule
from ..ops.video_keyframes import interpolate_video_from_indices
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
    meanpool_between_anchors,
    merged_wan_params,
    midpoint_indices,
)


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("train_keypoints_wansynth (Phase-1, TPU)")
    p.add_argument("--K", type=int, default=5)
    p.add_argument("--N_train", type=int, default=1000)
    p.add_argument("--schedule", type=str, default="linear")
    p.add_argument("--phase1_input_mode", type=str, default="short_anchors",
                   choices=["full", "short_anchors", "short_midpoints", "short_meanpool"])
    p.add_argument("--video_interp_mode", type=str, default="smooth",
                   choices=["linear", "smooth"])
    p.add_argument("--cond_drop_prob", type=float, default=0.1)
    p.add_argument("--uniform_jitter", type=float, default=0.5)
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
    p.add_argument("--out_dir", type=str, default="runs/kp_wansynth")
    p.add_argument("--save_every", type=int, default=500)
    p.add_argument("--ckpt_async", type=int, default=0,
                   help="orbax async checkpoints: serialization/IO on a "
                        "background thread so the train loop never stalls "
                        "on a save (multi-host safe)")
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--n_data_shards", type=int, default=None)
    p.add_argument("--profile_dir", type=str, default=None,
                   help="capture a jax.profiler trace of a post-compile step "
                        "window into this dir (view with TensorBoard)")
    p.add_argument("--profile_start", type=int, default=3)
    p.add_argument("--profile_steps", type=int, default=3)
    # token-transformer fallback (use_wan=0)
    p.add_argument("--d_model", type=int, default=512)
    p.add_argument("--n_layers", type=int, default=8)
    p.add_argument("--n_heads", type=int, default=8)
    p.add_argument("--d_ff", type=int, default=2048)
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    # resolve the resume checkpoint FIRST: its meta carries the data-stream
    # position, so a preempted run resumes mid-epoch instead of replaying
    # the stream from the top
    resume_path = None
    data_state = None
    if args.resume:
        resume_path = (args.resume
                       if os.path.exists(os.path.join(args.resume, "meta.json"))
                       else latest_checkpoint(args.resume))
        if resume_path:
            from ..utils.checkpoint import read_meta as _read_meta

            data_state = (_read_meta(resume_path)[1] or {}).get("data_state")
    loader = make_wansynth_loader(args, args.seed, state=data_state)
    schedule = make_schedule(args.schedule, args.N_train)
    T = args.T
    use_wan = bool(args.use_wan)
    mode = args.phase1_input_mode
    rng = jax.random.PRNGKey(args.seed)

    batch0 = next(loader)
    lat_shape = batch0["latents"].shape  # [B,T,C,H,W]
    _, _, C, H, W = lat_shape
    p_sz = args.patch_size
    N = (H // p_sz) * (W // p_sz)
    D_tok = C * p_sz * p_sz
    spatial = (H // p_sz, W // p_sz)

    if mode == "short_anchors":
        L_in = args.K
    elif mode in ("short_midpoints", "short_meanpool"):
        L_in = 2 * args.K - 1
    else:
        L_in = T

    rng, k_init, k_tr = jax.random.split(rng, 3)
    if use_wan:
        wan = build_wan(args, bool(args.bf16))
        wan_params = wan.init(
            k_init,
            jnp.zeros((1, C, L_in, H, W)), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 8, args.text_dim)),
            jnp.zeros((1, L_in), jnp.int32) if mode != "full" else None,
            jnp.zeros((1, L_in, args.text_dim)) if args.frame_cond else None,
        )["params"]
        wan_params = load_pretrained_into(wan_params, args)
        trainable, fc_module, base = init_wan_trainables(k_tr, args, wan_params, bool(args.bf16))
        n_base = sum(x.size for x in jax.tree_util.tree_leaves(wan_params))
        n_train = sum(x.size for x in jax.tree_util.tree_leaves(trainable))
        print(f"wan params: {n_base/1e6:.1f}M | trainable: {n_train/1e6:.3f}M "
              f"(lora_rank={args.lora_rank}, attn={args.attn_mode})")
    else:
        tok_model = VideoTokenKeypointDenoiser(
            d_model=args.d_model, n_layers=args.n_layers, n_heads=args.n_heads,
            d_ff=args.d_ff, data_dim=D_tok, use_start_goal=False,
            dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        )
        trainable = tok_model.init(
            k_init, jnp.zeros((1, args.K, N, D_tok)), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, args.K), jnp.int32),
            {"text_embed": jnp.zeros((1, 8, args.text_dim))}, T, spatial,
        )["params"]
        base, fc_module = None, None
        print(f"token model params: "
              f"{sum(x.size for x in jax.tree_util.tree_leaves(trainable))/1e6:.2f}M")

    def loss_fn(params, frozen, batch, rng):
        latents = batch["latents"]          # [B,T,C,H,W]
        text = batch["text_embed"]
        B = latents.shape[0]
        tokens, _ = patchify_latents(latents, p_sz)
        k_idx, k_t, k_eps, k_drop = jax.random.split(rng, 4)
        idx_base, _ = sample_fixed_k_indices_uniform_batch(
            k_idx, B, T, args.K, ensure_endpoints=False, jitter=args.uniform_jitter
        )
        if mode in ("short_midpoints", "short_meanpool"):
            idx_mid = midpoint_indices(idx_base)
            idx_in = jnp.sort(jnp.concatenate([idx_base, idx_mid], axis=1), axis=1)
        else:
            idx_in = idx_base
        z0_in = jnp.take_along_axis(tokens, idx_in[..., None, None], axis=1)
        if mode == "short_meanpool":
            pooled = meanpool_between_anchors(tokens, idx_base)
            pos_mid = jax.vmap(jnp.searchsorted)(idx_in, midpoint_indices(idx_base))
            b_ix = jnp.arange(B)[:, None]
            z0_in = z0_in.at[b_ix, pos_mid].set(pooled)

        t = jax.random.randint(k_t, (B,), 0, args.N_train)
        eps = jax.random.normal(k_eps, z0_in.shape, dtype=z0_in.dtype)
        sab = schedule.sqrt_alpha_bar[t][:, None, None, None]
        somab = schedule.sqrt_one_minus_alpha_bar[t][:, None, None, None]
        z_t = sab * z0_in + somab * eps

        if args.cond_drop_prob > 0.0:
            drop = jax.random.uniform(k_drop, (B,)) < args.cond_drop_prob
            text = jnp.where(drop[:, None, None], 0.0, text)

        if use_wan:
            extra = None
            if args.frame_cond:
                mask = jnp.zeros((B, T), dtype=bool).at[
                    jnp.arange(B)[:, None], idx_base
                ].set(True)
                feat = frame_features_from_mask(mask)
                if mode != "full":
                    feat = jnp.take_along_axis(feat, idx_in[..., None], axis=1)
                extra = fc_module.apply({"params": params["frame_cond"]}, feat)
            wparams = merged_wan_params(params, frozen, args)
            if mode == "full":
                # scatter noisy anchors into the T-seq + interpolate the rest
                z_flat = jnp.transpose(z_t, (0, 2, 1, 3)).reshape(B * N, args.K, D_tok)
                idx_rep = jnp.repeat(idx_base, N, axis=0)
                z_interp = interpolate_video_from_indices(
                    idx_rep, z_flat, T, mode=args.video_interp_mode
                )
                z_seq = jnp.transpose(
                    z_interp.reshape(B, N, T, D_tok), (0, 2, 1, 3)
                )
                b_ix = jnp.arange(B)[:, None]
                z_seq = z_seq.at[b_ix, idx_base].set(z_t)
                lat_in = jnp.transpose(unpatchify_tokens(z_seq, p_sz, spatial),
                                       (0, 2, 1, 3, 4))
                pred = wan.apply({"params": wparams}, lat_in, t, text, None, extra)
            else:
                lat_in = jnp.transpose(unpatchify_tokens(z_t, p_sz, spatial),
                                       (0, 2, 1, 3, 4))
                pred = wan.apply({"params": wparams}, lat_in, t, text, idx_in, extra)
            pred_tokens, _ = patchify_latents(jnp.transpose(pred, (0, 2, 1, 3, 4)), p_sz)
            if mode == "full":
                pred_sel = jnp.take_along_axis(pred_tokens, idx_base[..., None, None], axis=1)
                loss = jnp.mean((pred_sel - eps) ** 2)
            else:
                loss = jnp.mean((pred_tokens - eps) ** 2)
        else:
            eps_hat = tok_model.apply(
                {"params": params}, z_t, t, idx_in, {"text_embed": text}, T, spatial
            )
            loss = jnp.mean((eps_hat - eps) ** 2)
        return loss, {}

    mesh = make_mesh_for_batch(args.batch, n_data=args.n_data_shards)
    tx = make_optimizer(args.lr, args.weight_decay, args.grad_clip)
    state = init_train_state(trainable, tx, use_ema=bool(args.use_ema))
    start_step = 0
    if args.resume:
        path = resume_path
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
        "stage": "keypoints_wansynth", "T": T, "K": args.K,
        "N_train": args.N_train, "schedule": args.schedule,
        "phase1_input_mode": mode, "use_wan": args.use_wan,
        "wan_dim": args.wan_dim, "wan_layers": args.wan_layers,
        "wan_heads": args.wan_heads, "wan_ffn": args.wan_ffn,
        "attn_mode": args.attn_mode, "sla_topk": args.sla_topk,
        "lora_rank": args.lora_rank, "lora_alpha": args.lora_alpha,
        "lora_form": args.lora_form, "lora_targets": args.lora_targets,
        "layer_mode": args.layer_mode,
        "ffn_mode": args.ffn_mode, "n_experts": args.n_experts,
        "capacity_factor": args.capacity_factor,
        "frame_cond": args.frame_cond, "patch_size": p_sz,
        "latent_c": C, "latent_h": H, "latent_w": W,
        "text_dim": args.text_dim,
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
        return shard_batch(
            {"latents": b["latents"], "text_embed": b["text_embed"]}, mesh)

    host_iter = itertools.chain([batch0], loader)
    dev_iter = (DevicePrefetcher(host_iter, _put, depth=args.prefetch_depth)
                if args.prefetch_depth > 0 else map(_put, host_iter))
    t_prev = time.time()
    with mesh:
        for step in range(start_step, args.steps):
            check_cpu_mem(args.max_cpu_mem_percent)
            if args.profile_dir and step == start_step + args.profile_start:
                # trace a post-compile step window (TensorBoard-readable)
                from ..utils.profiling import trace as profiler_trace

                profile_ctx = profiler_trace(args.profile_dir)
                profile_ctx.__enter__()
            dev = next(dev_iter)
            rng, k = jax.random.split(rng)
            state, metrics = train_step(state, base, dev, k)
            if args.profile_dir and \
                    step == start_step + args.profile_start + args.profile_steps:
                jax.block_until_ready(metrics["loss"])
                profile_ctx.__exit__(None, None, None)
                print(f"profiler trace written to {args.profile_dir}")
            if step % args.log_every == 0:
                loss = float(metrics["loss"])  # device sync = true step timing
                now = time.time()
                dt = now - t_prev
                t_prev = now
                steps_done = max(1, args.log_every if step > start_step else 1)
                sps = args.batch * steps_done / dt
                print(f"step {step} loss {loss:.4f} | {dt/steps_done:.3f}s/step "
                      f"| {sps:.2f} samples/s | {sps*T:.1f} frames/s")
            if (step + 1) % args.save_every == 0 or step + 1 == args.steps:
                to_save = dict(state.params)
                if base is not None:
                    to_save["wan_base"] = base
                ckpt_dir = os.path.join(args.out_dir, f"ckpt_{step + 1}")
                # data-stream position rides in meta so --resume continues
                # the stream mid-epoch (may overshoot by the prefetch depth
                # — resume skips, never repeats, those batches)
                save_meta = dict(meta)
                if getattr(loader, "state", None) is not None:
                    save_meta["data_state"] = loader.state
                if args.ckpt_async:
                    from ..utils.checkpoint_sharded import (
                        save_checkpoint_sharded,
                    )
                    save_checkpoint_sharded(
                        ckpt_dir, to_save, None, step + 1, state.ema_params,
                        save_meta, async_save=True)
                else:
                    save_checkpoint(ckpt_dir, to_save, None, step + 1,
                                    state.ema_params, save_meta)
    if args.ckpt_async:
        from ..utils.checkpoint_sharded import wait_for_async_saves

        wait_for_async_saves()   # last checkpoint must be durable
    if hasattr(dev_iter, "close"):
        dev_iter.close()   # stop the prefetch thread, free queued batches
    return state


if __name__ == "__main__":
    main()
