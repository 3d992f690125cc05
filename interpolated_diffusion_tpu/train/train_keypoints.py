"""Stage-1 keypoint DDPM trainer (maze family).

Capability parity with reference src/train/train_keypoints.py: gather K
keypoints under a mixed index policy, optional logit-space transform,
q_sample, known-endpoint clamping of z_t with eps zeroing at known dims,
masked eps-MSE, grad-accum + clip + EMA, meta-rich checkpoints.

TPU-native: the whole step (batch corruption → q_sample → fwd/bwd → AdamW →
EMA) is ONE jitted SPMD program over a (data, model) mesh; anchor indices are
the only host-side input (tiny int array, policy-mixed).
"""
from __future__ import annotations

import argparse
import json
import os
import time
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..models.denoisers import KeypointDenoiser
from ..ops.ddpm import q_sample
from ..ops.schedules import make_schedule
from ..ops.selection import build_kp_feat_full
from ..parallel.mesh import (
    make_mesh_for_batch,
    replicate,
    shard_batch,
    shard_superbatch,
)
from ..utils.checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint
from .batches import build_known_mask_values, gather_keypoints
from .common import add_data_args, add_train_args, make_dataset, make_loader, sample_idx_policy
from ..ops.normalize import logit_pos
from .state import (
    init_train_state,
    make_optimizer,
    make_train_multi_step,
    make_train_step,
    stack_batches,
)


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("train_keypoints (Stage-1, TPU)")
    p.add_argument("--T", type=int, default=64)
    p.add_argument("--K", type=int, default=8)
    p.add_argument("--N_train", type=int, default=100)
    p.add_argument("--schedule", type=str, default="linear", choices=["linear", "cosine"])
    p.add_argument("--objective", type=str, default="eps",
                   choices=["eps", "rf"],
                   help="rf: rectified-flow velocity matching (straight "
                        "paths; samplers then Euler/midpoint-integrate "
                        "instead of DDIM)")
    p.add_argument("--reflow_teacher", type=str, default=None,
                   help="rf checkpoint to distill (ReFlow): training pairs "
                        "become the teacher's own (noise, generated) "
                        "couplings instead of data, straightening the flow "
                        "toward 1-2 step sampling. Requires --objective rf")
    p.add_argument("--reflow_steps", type=int, default=20,
                   help="teacher integration steps per coupling")
    p.add_argument("--d_model", type=int, default=384)
    p.add_argument("--n_layers", type=int, default=12)
    p.add_argument("--n_heads", type=int, default=12)
    p.add_argument("--d_ff", type=int, default=1536)
    p.add_argument("--d_cond", type=int, default=128)
    p.add_argument("--maze_channels", type=str, default="32,64,128,128")
    p.add_argument("--kp_feat_dim", type=int, default=0)
    p.add_argument("--use_kp_feat", type=int, default=0)
    p.add_argument("--dphi_ckpt", type=str, default=None,
                   help="segment-cost ckpt: fills kp_feat channels 3/4 with "
                        "the D_phi cost of each keypoint's left/right segment "
                        "(requires use_kp_feat=1, kp_feat_dim>=5; reference "
                        "train_keypoints.py:515-526)")
    p.add_argument("--logit_space", type=int, default=0)
    p.add_argument("--logit_eps", type=float, default=1e-5)
    p.add_argument("--clamp_endpoints", type=int, default=1)
    p.add_argument("--cond_start_goal", type=int, default=1)
    p.add_argument("--idx_policy", type=str, default="random:1.0",
                   help='mix like "dp:0.5,uniform:0.2,random:0.2,selector:0.1"')
    p.add_argument("--uniform_jitter", type=float, default=0.0)
    p.add_argument("--selector_ckpt", type=str, default=None)
    p.add_argument("--selector_stochastic", type=int, default=0)
    p.add_argument("--selector_tau", type=float, default=1.0)
    add_data_args(p)
    add_train_args(p)
    return p


def make_meta(args, data_dim: int) -> Dict:
    return {
        "stage": "keypoints",
        "T": args.T,
        "K": args.K,
        "N_train": args.N_train,
        "schedule": args.schedule,
        "objective": args.objective,
        "d_model": args.d_model,
        "n_layers": args.n_layers,
        "n_heads": args.n_heads,
        "d_ff": args.d_ff,
        "d_cond": args.d_cond,
        "maze_channels": args.maze_channels,
        "kp_feat_dim": args.kp_feat_dim,
        "use_kp_feat": args.use_kp_feat,
        # samplers must rebuild the cost channels with a D_phi ckpt or the
        # model runs off-distribution (channels 3/4 zero)
        "kp_feat_dphi": int(bool(args.dphi_ckpt)),
        "logit_space": args.logit_space,
        "logit_eps": args.logit_eps,
        "clamp_endpoints": args.clamp_endpoints,
        "cond_start_goal": args.cond_start_goal,
        "with_velocity": args.with_velocity,
        "use_sdf": args.use_sdf,
        "data_dim": data_dim,
        "maze_h": args.maze_h,
        "maze_w": args.maze_w,
    }


def build_model(args, data_dim: int) -> KeypointDenoiser:
    return KeypointDenoiser(
        d_model=args.d_model,
        n_layers=args.n_layers,
        n_heads=args.n_heads,
        d_ff=args.d_ff,
        d_cond=args.d_cond,
        use_sdf=bool(args.use_sdf),
        use_start_goal=bool(args.cond_start_goal),
        data_dim=data_dim,
        kp_feat_dim=args.kp_feat_dim if args.use_kp_feat else 0,
        maze_channels=tuple(int(c) for c in args.maze_channels.split(",")),
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )


def make_loss_fn(model: KeypointDenoiser, args, schedule, device_policy=None,
                 dphi_fn=None, reflow_fn=None):
    """loss_fn(params, batch, rng): batch has x, occ, start_goal[, idx].

    device_policy ("random"/"uniform") samples anchor indices inside the
    jitted step — avoids a host round trip per step when the policy mix has
    no dp/selector entries (the common case). dphi_fn(cond, idx) -> [B, K-1]
    fills the kp_feat cost channels (frozen D_phi, closed over as constants).
    """
    T = args.T
    use_kp_feat = bool(args.use_kp_feat)
    kp_feat_dim = args.kp_feat_dim

    def loss_fn(params, batch, rng):
        x0 = batch["x"]
        if device_policy is not None:
            rng, k_policy = jax.random.split(rng)
            if device_policy == "uniform":
                from ..ops.keyframes import sample_fixed_k_indices_uniform_batch

                idx, _ = sample_fixed_k_indices_uniform_batch(
                    k_policy, x0.shape[0], T, args.K,
                    jitter=args.uniform_jitter,
                )
            else:
                from ..ops.keyframes import sample_fixed_k_indices_batch

                idx, _ = sample_fixed_k_indices_batch(
                    k_policy, x0.shape[0], T, args.K
                )
        else:
            idx = batch["idx"]
        cond = {"occ": batch["occ"], "start_goal": batch["start_goal"]}
        if "sdf" in batch:
            cond["sdf"] = batch["sdf"]
        B, _, D = x0.shape
        z0 = gather_keypoints(x0, idx)
        known_mask, known_values = build_known_mask_values(
            idx, cond, D, T, bool(args.clamp_endpoints)
        )
        if args.logit_space:
            z0 = logit_pos(z0, eps=args.logit_eps)
            known_values = logit_pos(known_values, eps=args.logit_eps)
        if use_kp_feat:
            # frozen D_phi features (reference wraps this in torch.no_grad)
            seg_cost = (jax.lax.stop_gradient(dphi_fn(cond, idx))
                        if dphi_fn is not None else None)
            cond["kp_feat"] = build_kp_feat_full(idx, T, kp_feat_dim, seg_cost)

        k_t, k_eps = jax.random.split(rng)
        valid = (~known_mask).astype(jnp.float32)
        if args.objective == "rf":
            # rectified flow: straight-path velocity matching; the eps head
            # doubles as the velocity head, continuous τ rides the integer
            # timestep embedding (ops/rectified_flow.py)
            from ..ops.rectified_flow import rf_interpolate

            tau = jax.random.uniform(k_t, (B,))
            if reflow_fn is not None:
                # ReFlow: replace (data, fresh noise) with the frozen
                # teacher's own coupling — straightens the learned flow
                k_eps, k_pair = jax.random.split(k_eps)
                noise, z0 = reflow_fn(k_pair, idx, cond, known_mask,
                                      known_values)
                noise = jax.lax.stop_gradient(noise)
                z0 = jax.lax.stop_gradient(z0)
            else:
                noise = jax.random.normal(k_eps, z0.shape, z0.dtype)
            z_t, v = rf_interpolate(z0, tau, noise)
            z_t = jnp.where(known_mask, known_values, z_t)
            t_emb = (tau * (args.N_train - 1)).astype(jnp.int32)
            v_hat = model.apply({"params": params}, z_t, t_emb, idx,
                                known_mask, cond, T)
            v = v * (~known_mask)
            loss = ((v_hat - v) ** 2 * valid).sum() / (valid.sum() + 1e-8)
            return loss, {}
        t = jax.random.randint(k_t, (B,), 0, args.N_train)
        z_t, eps = q_sample(z0, t, schedule, key=k_eps)
        z_t = jnp.where(known_mask, known_values, z_t)
        eps = eps * (~known_mask)

        eps_hat = model.apply({"params": params}, z_t, t, idx, known_mask, cond, T)
        loss = ((eps_hat - eps) ** 2 * valid).sum() / (valid.sum() + 1e-8)
        return loss, {}

    return loss_fn


def make_reflow_fn(args):
    """Frozen rf teacher → (noise, generated) conditional couplings.

    The teacher integrates its velocity field from the SAME noise the loss
    then interpolates against (the ReFlow coupling), with known-value
    clamping applied every step so couplings stay on the conditional
    manifold."""
    from ..models.loading import load_keypoint_model
    from ..ops.rectified_flow import rf_integrate

    t_model, t_params, t_meta = load_keypoint_model(
        args.reflow_teacher, bool(args.bf16))
    if t_meta.get("objective") != "rf":
        raise ValueError("--reflow_teacher must be an rf-objective Stage-1 "
                         "checkpoint (meta objective=rf)")
    n_tr = int(t_meta["N_train"])
    T = args.T

    def reflow_fn(key, idx, cond, known_mask, known_values):
        B, K = idx.shape
        D = known_values.shape[-1]
        noise = jax.random.normal(key, (B, K, D))
        x = jnp.where(known_mask, known_values, noise)

        def velocity_fn(z, t_cont):
            t_emb = (t_cont * (n_tr - 1)).astype(jnp.int32)
            return t_model.apply({"params": t_params}, z, t_emb, idx,
                                 known_mask, cond, T)

        post = lambda z: jnp.where(known_mask, known_values, z)
        x = rf_integrate(velocity_fn, x, args.reflow_steps, post=post)
        return noise, x

    return reflow_fn


def main(argv=None):
    args = build_argparser().parse_args(argv)
    ds, data_dim = make_dataset(args)
    loader = iter(make_loader(ds, args))
    schedule = make_schedule(args.schedule, args.N_train)
    model = build_model(args, data_dim)

    mesh = make_mesh_for_batch(args.batch, n_data=args.n_data_shards)
    rng = jax.random.PRNGKey(args.seed)
    rng, k_init = jax.random.split(rng)

    sample_batch = next(loader)
    host_rng = np.random.RandomState(args.seed + 1)
    kp0 = sample_batch.get("kp_idx")
    idx0 = sample_idx_policy(host_rng, args.idx_policy, args.batch, args.T, args.K, kp0)
    init_cond = {
        "occ": jnp.asarray(sample_batch["occ"][:2]),
        "start_goal": jnp.asarray(sample_batch["start_goal"][:2]),
    }
    if args.use_sdf and "sdf" in sample_batch:
        init_cond["sdf"] = jnp.asarray(sample_batch["sdf"][:2])
    params = model.init(
        k_init,
        jnp.zeros((2, args.K, data_dim)),
        jnp.zeros((2,), dtype=jnp.int32),
        jnp.asarray(idx0[:2]),
        jnp.zeros((2, args.K, data_dim), dtype=bool),
        init_cond,
        args.T,
    )["params"]
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"model params: {n_params/1e6:.2f}M | mesh: {mesh.shape}")

    tx = make_optimizer(args.lr, args.weight_decay, args.grad_clip)
    state = init_train_state(params, tx, use_ema=bool(args.use_ema))
    start_step = 0
    if args.resume:
        path = (
            args.resume
            if os.path.exists(os.path.join(args.resume, "meta.json"))
            else latest_checkpoint(args.resume)
        )
        if path:
            start_step, payload = load_checkpoint(path, params, state.opt_state, params)
            state = state._replace(
                step=jnp.asarray(start_step, dtype=jnp.int32),
                params=payload["params"],
                opt_state=payload.get("opt_state", state.opt_state),
                ema_params=payload.get("ema", state.ema_params),
            )
            print(f"resumed from {path} @ step {start_step}")
    state = replicate(state, mesh)

    from .batches import parse_policy_mix

    mix_names = {n for n, _ in (parse_policy_mix(args.idx_policy) or [("random", 1.0)])}
    device_policy = None
    if mix_names == {"random"}:
        device_policy = "random"
    elif mix_names == {"uniform"}:
        device_policy = "uniform"

    dphi_fn = None
    if args.dphi_ckpt:
        if not args.use_kp_feat or args.kp_feat_dim < 5:
            raise ValueError("dphi_ckpt requires use_kp_feat=1 and kp_feat_dim>=5")
        from ..models.loading import make_dphi_seg_cost_fn

        dphi_fn, _ = make_dphi_seg_cost_fn(
            args.dphi_ckpt, args.T, bool(args.use_sdf), bool(args.bf16))

    reflow_fn = None
    if args.reflow_teacher:
        if args.objective != "rf":
            raise ValueError("--reflow_teacher requires --objective rf")
        reflow_fn = make_reflow_fn(args)
    loss_fn = make_loss_fn(model, args, schedule, device_policy, dphi_fn,
                           reflow_fn)
    spc = max(1, args.steps_per_call)
    train_step = make_train_multi_step(
        loss_fn, tx, args.ema_decay, args.grad_accum, spc
    )

    selector_fn = None
    if "selector" in args.idx_policy:
        if not args.selector_ckpt:
            raise ValueError("idx_policy includes selector but --selector_ckpt missing")
        from ..models.loading import load_selector_model
        from ..models.selector import select_topk_indices

        sel_model, sel_params, sel_meta = load_selector_model(
            args.selector_ckpt, bool(args.bf16)
        )

        def selector_fn(cond, k_sel):
            sc = dict(cond)
            if sel_meta.get("use_level"):
                sc["level"] = jnp.full((cond["occ"].shape[0], 1), args.K / max(1, args.T - 1))
            logits = sel_model.apply({"params": sel_params}, sc)
            return select_topk_indices(
                logits, args.K, bool(args.selector_stochastic), args.selector_tau, k_sel
            )

        selector_fn = jax.jit(selector_fn)

    meta = make_meta(args, data_dim)
    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "run_config.json"), "w") as f:
        json.dump({"args": vars(args), "meta": meta, "n_params": n_params}, f, indent=2)

    t0 = time.time()
    batch = sample_batch
    with mesh:
        step = start_step
        while step < args.steps:
            n_micro = min(spc, args.steps - step)
            micro = []
            for _ in range(spc):  # fixed S (avoid re-jit); surplus repeats last
                dev_batch = {
                    "x": batch["x"], "occ": batch["occ"],
                    "start_goal": batch["start_goal"],
                }
                if device_policy is None:
                    kp = batch.get("kp_idx")
                    sel_idx = None
                    if selector_fn is not None:
                        rng, k_sel = jax.random.split(rng)
                        sel_cond = {"occ": jnp.asarray(batch["occ"]),
                                    "start_goal": jnp.asarray(batch["start_goal"])}
                        if sel_meta.get("use_sdf") and "sdf" in batch:
                            sel_cond["sdf"] = jnp.asarray(batch["sdf"])
                        sel_idx = np.asarray(selector_fn(sel_cond, k_sel))
                    dev_batch["idx"] = sample_idx_policy(
                        host_rng, args.idx_policy, args.batch, args.T, args.K, kp,
                        args.uniform_jitter, sel_idx,
                    )
                if "sdf" in batch and args.use_sdf:
                    dev_batch["sdf"] = batch["sdf"]
                micro.append(dev_batch)
                batch = next(loader)
            dev = (shard_superbatch(stack_batches(micro), mesh) if spc > 1
                   else shard_batch(micro[0], mesh))
            rng, k_step = jax.random.split(rng)
            state, metrics = train_step(state, dev, k_step)
            step += n_micro
            if (step // spc) % max(1, args.log_every // spc) == 0:
                loss = float(metrics["loss"])
                dt = time.time() - t0
                sps = args.batch * (step - start_step) / max(dt, 1e-9)
                print(f"step {step} loss {loss:.4f} | {sps:.1f} samples/s")
            if step % args.save_every < n_micro or step >= args.steps:
                ckpt = os.path.join(args.out_dir, f"ckpt_{step}")
                save_checkpoint(
                    ckpt, state.params, state.opt_state, step,
                    state.ema_params, meta,
                )
                print(f"saved {ckpt}")
    return state


if __name__ == "__main__":
    main()
