"""Autoregressive chunked generation (causal Stage-2).

Capability parity with reference src/sample/sample_generate_causal.py (§3.4):
fixed-size window AR sampling — per chunk: right boundary = goal or a
heuristic step toward it, local Stage-1 keypoint DDIM with left/right
clamping, segment-lerp, then a single causal Stage-2 delta at s=levels over
the full prefix [0..end], hard clamp policy, splice, advance.

TPU-native: chunk offsets are static (cur_i = 1 + i·chunk), so the entire
while-loop unrolls at trace time into ONE jitted program; the causal Stage-2
always runs on the full padded T sequence (causal attention makes suffix
garbage invisible to prefix outputs).
"""
from __future__ import annotations

import argparse
import csv
import json
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..eval.metrics import compute_metrics_batch
from ..models.loading import load_interp_model, load_keypoint_model
from ..ops.clamp import apply_clamp
from ..ops.ddpm import ddim_scan, make_timesteps
from ..ops.keyframes import interpolate_from_indices, sample_fixed_k_indices_batch
from ..ops.normalize import logit_pos, sigmoid_pos
from ..ops.schedules import make_schedule
from ..parallel.ring import make_seq_mesh
from ..train.batches import recompute_velocity_channels
from ..train.common import add_data_args, make_dataset
from ..utils.checkpoint import read_meta


def make_causal_pipeline(
    kp_model, interp_model, kp_schedule, *,
    T: int, K_min: int, levels: int, chunk: int, ddim_steps: int,
    data_dim: int, logit_space: bool, logit_eps: float,
    clamp_endpoints: bool, clamp_policy: str, clamp_dims: str,
    recompute_vel: bool, mask_channels: int = 1, collect_chunks: bool = False,
    kp_feat_dim: int = 0, dphi_fn=None, stage1_cache_interval: int = 1,
    stage1_solver: str = "ddim",
    stage1_best_of: int = 1, stage1_best_of_mode: str = "set",
    seq_mesh=None,
):
    """Returns pipeline(kp_params, interp_params, key, cond) -> x_gen [B,T,D]
    (plus the per-chunk prefix states [n_chunks,B,T,D] with collect_chunks —
    the reference's per-chunk frame export, sample_generate_causal.py:584)."""
    # linear spacing IS the reference's causal sampler behavior (it calls
    # ddpm._timesteps with the default schedule, sample_generate_causal.py:193)
    # — unlike the e2e/keypoint samplers, which default to quadratic
    times = jnp.asarray(make_timesteps(kp_schedule.n_timesteps, ddim_steps, "linear"))

    # Long-horizon sequence sharding (SURVEY §5.7 / VERDICT-r4 stretch #8):
    # the full-buffer Stage-2 delta is the only O(T²) term in the causal
    # sampler (Stage-1 runs per-chunk); with seq_mesh set it runs inside
    # shard_map with T sharded over the "seq" axis and attention as
    # causal ring attention (parallel/ring.py) — global positions are
    # supplied via pos_frac, the parameter tree is unchanged, so trained
    # checkpoints serve long horizons without any device holding full K/V.
    # This is the reference's long-context story (chunked AR sampling,
    # sample_generate_causal.py:503-583, + SLA) recomposed as kernels +
    # sequence parallelism.
    s2_sharded = None
    if seq_mesh is not None:
        from jax.sharding import PartitionSpec as P

        ring_model = interp_model.clone(attn_impl="ring")
        if T % seq_mesh.shape["seq"]:
            raise ValueError(
                f"T={T} not divisible by seq_shard={seq_mesh.shape['seq']}")
        pos_frac_global = jnp.linspace(0.0, 1.0, T)

        def s2_sharded(params, x_full, s_level, mask_in, cond_vec):
            mi = (mask_in if mask_in.ndim == 3
                  else mask_in[..., None].astype(x_full.dtype))

            def inner(p, x_loc, s_b, m_loc, cv, pf):
                return ring_model.apply({"params": p}, x_loc, s_b, m_loc,
                                        {"cond_vec": cv}, pos_frac=pf)

            return jax.shard_map(
                inner, mesh=seq_mesh,
                in_specs=(P(), P(None, "seq", None), P(),
                          P(None, "seq", None), P(), P("seq")),
                out_specs=P(None, "seq", None),
            )(params, x_full, s_level, mi, cond_vec, pos_frac_global)

    def stage1_chunk(kp_params, key, idx, known_mask, known_values, cond, local_T):
        B, K = idx.shape
        if kp_feat_dim > 0:
            from ..ops.selection import build_kp_feat_full

            # geometry channels normalize by the chunk's local_T; D_phi cost
            # features normalize by the FULL T (the reference gathers chunk-
            # local segment ids from a full-T precompute,
            # sample_generate_causal.py:533-545) — dphi_fn closes over full T
            seg_cost = dphi_fn(cond, idx) if dphi_fn is not None else None
            feat = build_kp_feat_full(idx, local_T, kp_feat_dim, seg_cost)
            cond = dict(cond)
            cond["kp_feat"] = feat
        z = jax.random.normal(key, (B, K, data_dim))
        z = jnp.where(known_mask, known_values, z)

        def eps_fn(z, t_b, **cache_kw):
            return kp_model.apply({"params": kp_params}, z, t_b, idx,
                                  known_mask, cond, local_T, **cache_kw)

        post = lambda z: jnp.where(known_mask, known_values, z)
        from ..ops.ddpm import run_solver

        z, _ = run_solver(
            stage1_solver, eps_fn, z, times, kp_schedule, post=post,
            cache_interval=stage1_cache_interval,
            delta0=jnp.zeros((B, K, kp_model.d_model), kp_model.dtype),
        )
        if logit_space:
            z = sigmoid_pos(z)
        return z

    def pipeline(kp_params, interp_params, key, cond):
        sg = cond["start_goal"]
        B = sg.shape[0]
        start, goal = sg[:, :2], sg[:, 2:]
        x_gen = jnp.zeros((B, T, data_dim))
        x_gen = x_gen.at[:, 0, :2].set(start)
        mask_gen = jnp.zeros((B, T), dtype=bool).at[:, 0].set(True)

        cur = 1
        ci = 0
        chunk_states = []
        while cur < T:
            end = min(T - 1, cur + chunk - 1)
            L = end - cur + 1
            remaining = T - cur
            local_T = L + 1
            key, k_idx, k_s1 = jax.random.split(key, 3)

            left = x_gen[:, cur - 1, :2]
            if end == T - 1:
                right = goal
            else:
                frac = min(1.0, float(L) / max(1, remaining))
                right = left + frac * (goal - left)

            K_local = min(K_min, local_T)
            idx_local, mask_local = sample_fixed_k_indices_batch(
                k_idx, B, local_T, K_local, ensure_endpoints=True
            )
            known_mask = jnp.zeros((B, K_local, data_dim), dtype=bool)
            known_values = jnp.zeros((B, K_local, data_dim))
            if clamp_endpoints:
                is_l = (idx_local == 0)[..., None]
                is_r = (idx_local == local_T - 1)[..., None]
                km = jnp.broadcast_to(is_l | is_r, (B, K_local, 2))
                known_mask = known_mask.at[:, :, :2].set(km)
                kv = jnp.where(is_l, left[:, None, :], 0.0)
                kv = jnp.where(is_r, right[:, None, :], kv)
                known_values = known_values.at[:, :, :2].set(kv)
            if logit_space:
                known_values = logit_pos(known_values, eps=logit_eps)

            cond_chunk = dict(cond)
            cond_chunk["start_goal"] = jnp.concatenate([left, right], axis=1)
            if stage1_best_of > 1:
                # per-chunk best-of-N anchors (sample/generate.py semantics;
                # DP mode mixes candidates per anchor via _dp_mix_anchors)
                from .generate import _collision_score, _dp_mix_anchors

                keys = jax.random.split(k_s1, stage1_best_of)
                z_cands = jax.vmap(lambda k: stage1_chunk(
                    kp_params, k, idx_local, known_mask, known_values,
                    cond_chunk, local_T))(keys)
                occ2 = cond["occ"][:, 0] if cond["occ"].ndim == 4 else cond["occ"]
                if stage1_best_of_mode == "dp":
                    z_hat = _dp_mix_anchors(z_cands, idx_local, occ2, local_T)
                else:
                    scores = jax.vmap(lambda z: _collision_score(
                        interpolate_from_indices(idx_local, z, local_T),
                        occ2))(z_cands)
                    best = jnp.argmin(scores, axis=0)
                    z_hat = jnp.take_along_axis(
                        z_cands, best[None, :, None, None], axis=0)[0]
            else:
                z_hat = stage1_chunk(
                    kp_params, k_s1, idx_local, known_mask, known_values,
                    cond_chunk, local_T
                )
            x_s = interpolate_from_indices(idx_local, z_hat, local_T,
                                           recompute_velocity=recompute_vel)

            # splice chunk into the running buffer (positions cur-1 .. end)
            x_full = jax.lax.dynamic_update_slice(
                x_gen, x_s, (0, cur - 1, 0)
            )
            chunk_mask = jnp.zeros((B, T), dtype=bool)
            chunk_mask = jax.lax.dynamic_update_slice(chunk_mask, mask_local, (0, cur - 1))
            mask_full = jnp.where(
                jnp.arange(T)[None, :] < cur - 1, mask_gen, chunk_mask
            )

            # causal Stage-2 single delta at s = levels over the full buffer.
            # Adapt mask channels to the checkpoint config (adj ckpts expect
            # [mask_s, mask_prev] (+conf); in AR mode both are the splice mask).
            if mask_channels == 1:
                mask_in = mask_full
            else:
                chans = [mask_full.astype(jnp.float32)] * min(2, mask_channels)
                if mask_channels >= 3:
                    chans.append(mask_full.astype(jnp.float32))
                mask_in = jnp.stack(chans[:mask_channels], axis=-1)
            s_level = jnp.full((B,), levels, dtype=jnp.int32)
            if s2_sharded is not None:
                from .generate import hoist_cond_vec

                hc = hoist_cond_vec(interp_model, interp_params, cond_chunk)
                cv = (hc or {}).get("cond_vec")
                if cv is None:  # no maze encoder in the checkpoint
                    cv = jnp.zeros((B, interp_model.d_cond),
                                   dtype=interp_model.dtype)
                delta = s2_sharded(interp_params, x_full, s_level, mask_in, cv)
            else:
                delta = interp_model.apply(
                    {"params": interp_params}, x_full, s_level, mask_in,
                    cond_chunk
                )
            x_hat = x_full + delta
            if clamp_policy == "all_anchors":
                x_hat = apply_clamp(x_hat, x_full, mask_full, clamp_dims)
            elif clamp_policy == "endpoints":
                cm = jnp.zeros((B, T), dtype=bool).at[:, cur - 1].set(True).at[:, end].set(True)
                x_hat = apply_clamp(x_hat, x_full, cm, clamp_dims)

            # write back only the new rows cur..end
            in_chunk = (jnp.arange(T)[None, :] >= cur) & (jnp.arange(T)[None, :] <= end)
            upd = x_gen.at[..., :2].set(
                jnp.where(in_chunk[..., None], x_hat[..., :2], x_gen[..., :2])
            )
            if data_dim > 2 and recompute_vel:
                upd = upd.at[..., 2:].set(
                    jnp.where(in_chunk[..., None], x_hat[..., 2:], upd[..., 2:])
                )
            x_gen = upd
            mask_gen = mask_full
            cur = end + 1
            ci += 1
            if collect_chunks:
                chunk_states.append(x_gen)

        if recompute_vel and data_dim == 4:
            x_gen = recompute_velocity_channels(x_gen, T)
        if collect_chunks:
            return x_gen, jnp.stack(chunk_states, axis=0)
        return x_gen

    return pipeline


def _export_chunks(args, cond, gt, chunks, x_gen):
    """Per-chunk frames + GIF for sample 0 (reference :584-630)."""
    from ..eval.visualize import plot_occupancy_trajectories

    occ = np.asarray(cond["occ"])
    sg = np.asarray(cond["start_goal"])
    frames_dir = os.path.join(args.out_dir, "chunks")
    os.makedirs(frames_dir, exist_ok=True)
    paths = []
    for ci in range(chunks.shape[0]):
        paths.append(plot_occupancy_trajectories(
            occ[0], [gt[0], np.asarray(chunks[ci][0])], labels=["gt", "prefix"],
            start_goal=sg[0],
            out_path=os.path.join(frames_dir, f"chunk_{ci:03d}.png"),
            title=f"chunk {ci}",
        ))
    try:
        from PIL import Image

        imgs = [Image.open(p) for p in paths]
        imgs[0].save(os.path.join(args.out_dir, "chunks.gif"), save_all=True,
                     append_images=imgs[1:], duration=400, loop=0)
    except Exception as e:
        print(f"gif export skipped ({e})")
    np.savez_compressed(
        os.path.join(args.out_dir, "samples.npz"),
        # x_gen is the FINAL pipeline output (after the post-loop velocity
        # recompute when recompute_vel and data_dim==4) — the last chunk
        # predates that recompute, so its velocity channels would differ from
        # the trajectories actually returned and scored
        x_gen=np.asarray(x_gen), gt=gt, occ=occ, start_goal=sg,
        chunks=np.asarray(chunks),
    )


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("sample_generate_causal (AR chunked, TPU)")
    p.add_argument("--kp_ckpt", type=str, required=True)
    p.add_argument("--interp_ckpt", type=str, required=True)
    p.add_argument("--use_ema", type=int, default=1)
    p.add_argument("--chunk", type=int, default=16)
    p.add_argument("--K_min", type=int, default=4)
    p.add_argument("--dphi_ckpt", type=str, default=None,
                   help="segment-cost ckpt for the kp_feat cost channels")
    p.add_argument("--stage1_cache_interval", type=int, default=1,
                   help="FORA-style transformer caching in each chunk's "
                        "DDIM scan (1 = exact)")
    p.add_argument("--stage1_solver", type=str, default="ddim",
                   choices=["ddim", "pfdiff", "dpm"],
                   help="pfdiff: past-score springboard per chunk; dpm: "
                        "DPM-Solver++(2M) 2nd-order accuracy per eval")
    p.add_argument("--stage1_best_of", type=int, default=1,
                   help="per-chunk best-of-N anchor search (collision-"
                        "scored; see sample/generate.py)")
    p.add_argument("--stage1_best_of_mode", type=str, default="set",
                   choices=["set", "dp"])
    p.add_argument("--seq_shard", type=int, default=0,
                   help="N>1: shard the full-buffer Stage-2 forward over an "
                        "N-device 'seq' mesh axis with causal ring "
                        "attention (long-horizon T; requires N | T and N "
                        "local devices)")
    p.add_argument("--ddim_steps", type=int, default=10)
    p.add_argument("--num_batches", type=int, default=2)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--clamp_policy", type=str, default="endpoints",
                   choices=["endpoints", "all_anchors", "none"])
    p.add_argument("--clamp_dims", type=str, default="pos", choices=["pos", "all"])
    p.add_argument("--sample_seed", type=int, default=1234)
    p.add_argument("--bf16", type=int, default=1)
    p.add_argument("--sanity", type=int, default=0,
                   help="exit non-zero when the summary trips the hard "
                        "quality thresholds (generate.check_summary_sanity)")
    p.add_argument("--out_dir", type=str, default="runs/samples_causal")
    p.add_argument("--save_chunks", type=int, default=0,
                   help="export per-chunk frames (PNG + GIF) for sample 0 of "
                        "batch 0 + samples.npz")
    add_data_args(p)
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    kp_model, kp_params, kp_meta = load_keypoint_model(args.kp_ckpt, bool(args.bf16), bool(args.use_ema))
    interp_model, interp_params, il_meta = load_interp_model(args.interp_ckpt, bool(args.bf16), bool(args.use_ema))
    if not il_meta.get("causal", 0):
        print("warning: interp checkpoint is not causal; results follow the bidirectional model")
    T = int(kp_meta["T"])
    data_dim = int(kp_meta["data_dim"])
    dphi_fn = None
    if args.dphi_ckpt:
        from ..models.loading import make_dphi_seg_cost_fn

        dphi_fn, _ = make_dphi_seg_cost_fn(
            args.dphi_ckpt, T, kp_meta.get("use_sdf"), bool(args.bf16))
    elif kp_meta.get("kp_feat_dphi"):
        raise ValueError(
            "Stage-1 ckpt was trained with D_phi kp_feat cost channels — "
            "pass --dphi_ckpt (channels 3/4 would be off-distribution zeros)")
    pipeline = jax.jit(make_causal_pipeline(
        kp_model, interp_model, make_schedule(kp_meta["schedule"], int(kp_meta["N_train"])),
        T=T, K_min=args.K_min, levels=int(il_meta["levels"]), chunk=args.chunk,
        ddim_steps=args.ddim_steps, data_dim=data_dim,
        logit_space=bool(kp_meta.get("logit_space", 0)),
        logit_eps=float(kp_meta.get("logit_eps", 1e-5)),
        clamp_endpoints=bool(kp_meta.get("clamp_endpoints", 1)),
        clamp_policy=args.clamp_policy, clamp_dims=args.clamp_dims,
        recompute_vel=bool(il_meta.get("recompute_vel", 0)) and data_dim == 4,
        mask_channels=int(il_meta.get("mask_channels", 1)),
        collect_chunks=bool(args.save_chunks),
        kp_feat_dim=(int(kp_meta.get("kp_feat_dim", 0))
                     if kp_meta.get("use_kp_feat") else 0),
        dphi_fn=dphi_fn,
        stage1_cache_interval=args.stage1_cache_interval,
        stage1_solver=args.stage1_solver,
        stage1_best_of=args.stage1_best_of,
        stage1_best_of_mode=args.stage1_best_of_mode,
        seq_mesh=(make_seq_mesh(args.seq_shard)
                  if args.seq_shard > 1 else None),
    ))

    args.T = T
    ds, _ = make_dataset(args)
    host_rng = np.random.RandomState(args.sample_seed)
    key = jax.random.PRNGKey(args.sample_seed)
    os.makedirs(args.out_dir, exist_ok=True)
    rows = []
    t_total, n_total = 0.0, 0
    for bi in range(args.num_batches):
        batch = ds.get_batch(host_rng.randint(0, len(ds), size=args.batch))
        cond = {"occ": jnp.asarray(batch["occ"]),
                "start_goal": jnp.asarray(batch["start_goal"])}
        if "sdf" in batch and (kp_meta.get("use_sdf") or il_meta.get("use_sdf")):
            cond["sdf"] = jnp.asarray(batch["sdf"])
        key, k_b = jax.random.split(key)
        t0 = time.time()
        out = pipeline(kp_params, interp_params, k_b, cond)
        x_gen, chunks = (out if args.save_chunks else (out, None))
        x_gen.block_until_ready()
        dt = time.time() - t0
        if bi > 0:
            t_total += dt
            n_total += args.batch
        m = compute_metrics_batch(cond["occ"], x_gen, cond["start_goal"][:, 2:],
                                  jnp.asarray(batch["x"]))
        for b in range(args.batch):
            rows.append({"batch": bi, "sample": b,
                         **{k: float(v[b]) for k, v in m.items()}})
        print(f"batch {bi}: {dt:.3f}s coll={float(m['collision_rate'].mean()):.4f} "
              f"goal={float(m['goal_dist'].mean()):.4f}")
        if bi == 0 and args.save_chunks:
            _export_chunks(args, cond, np.asarray(batch["x"]), chunks,
                           np.asarray(x_gen))

    with open(os.path.join(args.out_dir, "metrics.csv"), "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    summary = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]
               if k not in ("batch", "sample")}
    if n_total:
        summary["samples_per_sec"] = n_total / t_total
    from .generate import check_summary_sanity

    sanity = check_summary_sanity(summary)
    summary["sanity"] = sanity
    with open(os.path.join(args.out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    from ..utils.run_config import archive_evidence, write_run_config
    write_run_config(args.out_dir, args)
    archive_evidence(args.out_dir)
    print("summary:", json.dumps(summary, indent=2))
    if sanity["failures"] and getattr(args, "sanity", 0):
        import sys

        print("SANITY FAILED:", "; ".join(sanity["failures"]), file=sys.stderr)
        sys.exit(2)
    return summary


if __name__ == "__main__":
    main()
