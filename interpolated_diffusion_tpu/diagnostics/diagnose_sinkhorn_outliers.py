"""Per-case Sinkhorn-warp outlier triage on wan-synth latents.

Capability parity with reference scripts/diagnose_sinkhorn_outliers_wansynth.py:
sample random (t0, t1, t) triplets, interpolate the interior frame with a
trained SinkhornWarpInterpolator, and rank cases by how much worse (or
better) the warp is than plain LERP — alongside the per-case correspondence
telemetry that explains catastrophic outliers: token-flow magnitude,
Sinkhorn/dustbin confidence, forward-backward consistency error, and the
global SE(2) estimate (θ, dx, dy). Optionally also measures everything in a
trained straightener's space (straight-LERP baseline).

TPU-native stance: the whole per-batch measurement is ONE jitted function
(features → bidirectional flows/confidences → warp-blend → MSEs → telemetry);
triplet sampling is host-side numpy; case records are assembled on host from
the returned stat arrays. Where the reference gates conf-scaled flows behind
--scale_flow_by_conf, we measure BOTH variants per case (conf-shrunk warping
is this repo's interpolator default), so the "are outliers caused by large
low-confidence warps?" question is answered in one pass.
"""
from __future__ import annotations

import argparse
import json
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..models.sinkhorn_warp import SinkhornWarpInterpolator
from ..ops.image import resize_bilinear, warp
from ..train.wansynth_common import add_wansynth_data_args, make_wansynth_loader
from ..utils.checkpoint import load_checkpoint
from .diagnose_latent_straightness import sample_triplets

CASE_FIELDS = (
    "sinkhorn_mse", "sinkhorn_rawflow_mse", "lerp_mse", "straight_lerp_mse",
    "flow01_tok_mag_mean", "flow01_tok_mag_max",
    "conf01_tok_mean", "conf10_tok_mean",
    "fb_err01_tok_mean", "fb_err10_tok_mean",
    "theta_deg", "dx_tok", "dy_tok",
)


def main(argv=None):
    p = argparse.ArgumentParser("diagnose_sinkhorn_outliers")
    p.add_argument("--ckpt", type=str, required=True,
                   help="sinkhorn_interp checkpoint")
    add_wansynth_data_args(p)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--num_batches", type=int, default=20)
    p.add_argument("--min_gap", type=int, default=2)
    p.add_argument("--topk", type=int, default=12)
    p.add_argument("--straightener_ckpt", type=str, default="")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out_dir", type=str, default="runs/sinkhorn_outliers")
    p.add_argument("--save_tensors", type=int, default=1,
                   help="save the worst-K (z0, z1, zt, z_hat) tensors as npz")
    args = p.parse_args(argv)

    from ..utils.checkpoint import read_meta
    _, meta = read_meta(args.ckpt)
    model = SinkhornWarpInterpolator.from_meta(meta)
    C = int(meta["in_channels"])
    lat0 = jnp.zeros((1, 3, C, args.latent_h, args.latent_w), jnp.float32)
    idx0 = jnp.asarray([[0, 2]], jnp.int32)
    tmpl = model.init(jax.random.PRNGKey(0), lat0, idx0)["params"]
    _, payload = load_checkpoint(args.ckpt, tmpl)
    params = payload["params"]

    straightener = s_params = None
    if args.straightener_ckpt:
        from ..models.straightener import load_latent_straightener
        straightener, s_params, _ = load_latent_straightener(
            args.straightener_ckpt, sample_hw=(args.latent_h, args.latent_w))

    ps = float(meta["patch_size"])

    @jax.jit
    def measure(z0, z1, zt, alpha):
        """[B,C,H,W] endpoint/target latents → per-case stat dict."""
        B, _, H, W = z0.shape
        a4 = alpha[:, None, None, None].astype(jnp.float32)

        tokf = lambda z: model.apply(
            {"params": params}, z, True,
            method=SinkhornWarpInterpolator.token_features)
        f0, hp, wp = tokf(z0)
        f1, _, _ = tokf(z1)

        flow01_tok, conf01_tok = model.apply(
            {"params": params}, f0, f1, hp, wp,
            method=SinkhornWarpInterpolator._flow_and_conf)
        flow10_tok, conf10_tok = model.apply(
            {"params": params}, f1, f0, hp, wp,
            method=SinkhornWarpInterpolator._flow_and_conf)
        theta, dx, dy = model.apply(
            {"params": params}, f0, f1,
            method=SinkhornWarpInterpolator._global_se2)

        # forward-backward consistency error in token units (the raw signal
        # behind the module's fb_sigma confidence gate)
        f01c = jnp.transpose(flow01_tok, (0, 3, 1, 2)).astype(jnp.float32)
        f10c = jnp.transpose(flow10_tok, (0, 3, 1, 2)).astype(jnp.float32)
        fb01 = jnp.linalg.norm(f01c + warp(f10c, f01c), axis=1)
        fb10 = jnp.linalg.norm(f10c + warp(f01c, f10c), axis=1)
        if model.fb_sigma > 0.0:
            g = lambda e: jnp.clip(jnp.exp(-0.5 * (e / model.fb_sigma) ** 2), 0.0, 1.0)
            conf01_tok = conf01_tok * g(fb01)
            conf10_tok = conf10_tok * g(fb10)

        flow01 = resize_bilinear(f01c, (H, W)) * ps
        flow10 = resize_bilinear(f10c, (H, W)) * ps
        c01 = jnp.clip(resize_bilinear(conf01_tok[:, None], (H, W)), 0.0, 1.0)
        c10 = jnp.clip(resize_bilinear(conf10_tok[:, None], (H, W)), 0.0, 1.0)

        def blend(conf_scale):
            s01 = c01 if conf_scale else 1.0
            s10 = c10 if conf_scale else 1.0
            fa = flow01 * s01 * a4
            fb = flow10 * s10 * (1.0 - a4)
            z0w, z1w = warp(z0, -fa), warp(z1, -fb)
            c0w, c1w = warp(c01, -fa), warp(c10, -fb)
            w0, w1 = (1.0 - a4) * c0w, a4 * c1w
            denom = w0 + w1
            z_mix = (w0 * z0w + w1 * z1w) / jnp.maximum(denom, 1e-6)
            z_lerp = (1.0 - a4) * z0 + a4 * z1
            return jnp.where(denom > 1e-6, z_mix, z_lerp)

        mse = lambda a, b: ((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2
                            ).mean(axis=(1, 2, 3))
        z_hat = blend(conf_scale=True)
        out = {
            "sinkhorn_mse": mse(z_hat, zt),
            "sinkhorn_rawflow_mse": mse(blend(conf_scale=False), zt),
            "lerp_mse": mse((1.0 - a4) * z0 + a4 * z1, zt),
            "flow01_tok_mag_mean": jnp.linalg.norm(flow01_tok, axis=-1).mean(axis=(1, 2)),
            "flow01_tok_mag_max": jnp.linalg.norm(flow01_tok, axis=-1).max(axis=(1, 2)),
            "conf01_tok_mean": conf01_tok.mean(axis=(1, 2)),
            "conf10_tok_mean": conf10_tok.mean(axis=(1, 2)),
            "fb_err01_tok_mean": fb01.mean(axis=(1, 2)),
            "fb_err10_tok_mean": fb10.mean(axis=(1, 2)),
            "theta_deg": theta * (180.0 / math.pi),
            "dx_tok": dx, "dy_tok": dy,
        }
        if straightener is not None:
            enc = lambda z: straightener.apply({"params": s_params}, z,
                                               method="encode")
            dec = lambda s: straightener.apply({"params": s_params}, s,
                                               method="decode")
            s_lerp = (1.0 - a4) * enc(z0) + a4 * enc(z1)
            out["straight_lerp_mse"] = mse(dec(s_lerp), zt)
        else:
            out["straight_lerp_mse"] = jnp.full((B,), jnp.nan)
        return out, z_hat

    loader = make_wansynth_loader(args, args.seed)
    rng = np.random.RandomState(args.seed + 1234)
    T = args.T

    cases = []
    tensors = []  # (z0, z1, zt, z_hat) per case, host numpy
    for bi in range(args.num_batches):
        batch = next(loader)
        lat = np.asarray(batch["latents"], np.float32)
        keys = batch.get("__keys__", [""] * lat.shape[0])
        B = lat.shape[0]
        t0, t1, t, alpha = sample_triplets(B, T, args.min_gap, rng)
        take = lambda ti: jnp.asarray(lat[np.arange(B), ti])
        stats, z_hat = measure(take(t0), take(t1), take(t),
                               jnp.asarray(alpha))
        host = {k: np.asarray(v) for k, v in stats.items()}
        z_hat = np.asarray(z_hat)
        for i in range(B):
            rec = {"key": str(keys[i]), "batch": bi, "index": i,
                   "t0": int(t0[i]), "t1": int(t1[i]), "t": int(t[i]),
                   "gap": int(t1[i] - t0[i]), "alpha": float(alpha[i])}
            for f in CASE_FIELDS:
                rec[f] = float(host[f][i])
            rec["delta_vs_lerp"] = rec["sinkhorn_mse"] - rec["lerp_mse"]
            rec["delta_vs_straight"] = (
                rec["sinkhorn_mse"] - rec["straight_lerp_mse"])
            cases.append(rec)
            if args.save_tensors:
                tensors.append((lat[i, t0[i]], lat[i, t1[i]], lat[i, t[i]],
                                z_hat[i]))

    cases_sorted = sorted(cases, key=lambda c: c["delta_vs_lerp"], reverse=True)
    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "cases.jsonl"), "w") as f:
        for c in cases_sorted:
            f.write(json.dumps(c) + "\n")

    arr = lambda f: np.asarray([c[f] for c in cases])
    summary = {
        "n_cases": len(cases),
        "sinkhorn_mse_mean": float(arr("sinkhorn_mse").mean()),
        "rawflow_mse_mean": float(arr("sinkhorn_rawflow_mse").mean()),
        "lerp_mse_mean": float(arr("lerp_mse").mean()),
        "frac_worse_than_lerp": float((arr("delta_vs_lerp") > 0).mean()),
        "worst_delta_vs_lerp": float(arr("delta_vs_lerp").max()),
        # is the conf-shrunk warp rescuing the raw-flow outliers?
        "rawflow_worst_delta": float(
            (arr("sinkhorn_rawflow_mse") - arr("lerp_mse")).max()),
    }
    with open(os.path.join(args.out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)

    if args.save_tensors:
        order = sorted(range(len(cases)),
                       key=lambda i: cases[i]["delta_vs_lerp"], reverse=True)
        worst = order[: args.topk]
        np.savez(os.path.join(args.out_dir, "worst_cases.npz"),
                 z0=np.stack([tensors[i][0] for i in worst]),
                 z1=np.stack([tensors[i][1] for i in worst]),
                 zt=np.stack([tensors[i][2] for i in worst]),
                 z_hat=np.stack([tensors[i][3] for i in worst]),
                 meta=json.dumps([cases[i] for i in worst]))

    print(json.dumps(summary, indent=2))
    name = lambda c: c["key"] or "b{batch}i{index}".format(**c)
    print(f"\nworst {args.topk} vs LERP:")
    for c in cases_sorted[: args.topk]:
        print(f"  key={name(c)} "
              f"gap={c['gap']} Δlerp={c['delta_vs_lerp']:+.5f} "
              f"flowmax={c['flow01_tok_mag_max']:.2f} "
              f"conf={c['conf01_tok_mean']:.3f} "
              f"fb={c['fb_err01_tok_mean']:.2f} θ={c['theta_deg']:+.1f}°")
    print(f"\nbest {args.topk} vs LERP:")
    for c in cases_sorted[-args.topk:][::-1]:
        print(f"  key={name(c)} gap={c['gap']} "
              f"Δlerp={c['delta_vs_lerp']:+.5f}")
    return summary


if __name__ == "__main__":
    main()
