"""Interpolator quality evaluation vs the LERP baseline.

Parity with reference scripts/eval_flow_interpolator_wansynth*.py and
scripts/diagnose_sinkhorn_outliers_wansynth.py: latent L1/MSE and PSNR/SSIM
vs LERP on held-out clips, plus the per-sample outlier scan (warp-vs-lerp
delta tail) that motivated the confidence fallback.
"""
from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from ..data.wan_synth import SyntheticWanDataset, WanSynthTarDataset
from ..ops.keyframes import interpolate_from_indices, sample_fixed_k_indices_batch


def psnr(pred: np.ndarray, target: np.ndarray, data_range: float = None) -> float:
    mse = float(((pred - target) ** 2).mean())
    if data_range is None:
        data_range = float(target.max() - target.min()) or 1.0
    return float(10.0 * np.log10(data_range ** 2 / max(mse, 1e-12)))


def ssim(pred: np.ndarray, target: np.ndarray) -> float:
    """Global-statistics SSIM (per-frame means/vars/cov), averaged."""
    p = pred.reshape(pred.shape[0], -1).astype(np.float64)
    t = target.reshape(target.shape[0], -1).astype(np.float64)
    mu_p, mu_t = p.mean(1), t.mean(1)
    var_p, var_t = p.var(1), t.var(1)
    cov = ((p - mu_p[:, None]) * (t - mu_t[:, None])).mean(1)
    L = max(float(t.max() - t.min()), 1e-6)
    c1, c2 = (0.01 * L) ** 2, (0.03 * L) ** 2
    s = ((2 * mu_p * mu_t + c1) * (2 * cov + c2)) / (
        (mu_p ** 2 + mu_t ** 2 + c1) * (var_p + var_t + c2))
    return float(s.mean())


def _lerp(latents, idx):
    B, T = latents.shape[:2]
    flat = latents.reshape(B, T, -1)
    vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
    return interpolate_from_indices(idx, vals, T).reshape(latents.shape)


def main(argv=None):
    p = argparse.ArgumentParser("eval_interpolators")
    p.add_argument("--interpolator", type=str, default="lerp",
                   choices=["lerp", "flow", "sinkhorn", "tiny"])
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--data", type=str, default="synthetic", choices=["synthetic", "tar"])
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--T", type=int, default=21)
    p.add_argument("--K", type=int, default=5)
    p.add_argument("--latent_c", type=int, default=16)
    p.add_argument("--latent_h", type=int, default=16)
    p.add_argument("--latent_w", type=int, default=16)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--num_batches", type=int, default=8)
    p.add_argument("--outlier_delta", type=float, default=0.5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bf16", type=int, default=0)
    p.add_argument("--out_json", type=str, default=None)
    p.add_argument("--rgb", type=int, default=0,
                   help="also decode 4-channel SD latents through the flax "
                        "SD VAE and report pixel-space PSNR/SSIM (reference "
                        "eval_flow_interpolator_wansynth_rgb.py; 16-channel "
                        "Wan latents have no in-repo decoder — latent "
                        "metrics only for those)")
    p.add_argument("--vae_sd", type=str, default=None,
                   help="diffusers SD-VAE checkpoint dir/file for --rgb; "
                        "random-init decoder if omitted (smoke only)")
    args = p.parse_args(argv)

    interp_fn = None
    if args.interpolator in ("flow", "sinkhorn", "tiny"):
        if not args.ckpt:
            raise ValueError(f"--ckpt required for {args.interpolator}")
        from ..utils.checkpoint import read_meta, load_checkpoint
        from ..models.loading import resolve_ckpt

        path = resolve_ckpt(args.ckpt)
        _, meta = read_meta(path)
        if "in_channels" in meta and int(meta["in_channels"]) != args.latent_c:
            print(f"latent_c {args.latent_c} -> {meta['in_channels']} (ckpt meta)")
            args.latent_c = int(meta["in_channels"])
        if args.interpolator == "flow":
            from ..models.flow_interpolator import LatentFlowInterpolator

            model = LatentFlowInterpolator(
                in_channels=meta["in_channels"], base_channels=meta["base_channels"],
                max_flow=meta["max_flow"], residual_blocks=meta["residual_blocks"],
                time_mask=bool(meta["time_mask"]), gap_cond=bool(meta["gap_cond"]),
                use_cost_volume=bool(meta["cost_volume"]), cv_radius=meta["cv_radius"],
            )
        elif args.interpolator == "sinkhorn":
            from ..models.sinkhorn_warp import SinkhornWarpInterpolator

            model = SinkhornWarpInterpolator.from_meta(meta)
        lat0 = jnp.zeros((1, args.T, args.latent_c, args.latent_h, args.latent_w))
        idx0, _ = sample_fixed_k_indices_batch(jax.random.PRNGKey(0), 1, args.T, args.K)
        tmpl = model.init(jax.random.PRNGKey(0), lat0, idx0)["params"]
        _, payload = load_checkpoint(path, tmpl)
        params = payload["params"]
        out_fn = jax.jit(lambda lat, idx: model.apply({"params": params}, lat, idx)[0])
        interp_fn = out_fn

    if args.data == "tar":
        ds_iter = WanSynthTarDataset(args.data_root, T=args.T,
                                     process_split=False).batches(args.batch)
        get_batch = lambda _: next(ds_iter)
    else:
        ds = SyntheticWanDataset(n_samples=args.batch * args.num_batches,
                                 T=args.T, C=args.latent_c, H=args.latent_h,
                                 W=args.latent_w, text_len=4, text_dim=8,
                                 seed=args.seed + 7)
        rng = np.random.RandomState(args.seed)
        get_batch = lambda _: ds.get_batch(rng.randint(0, len(ds), args.batch))

    decode_fn = None
    if args.rgb:
        if args.latent_c != 4:
            raise SystemExit(
                f"--rgb needs 4-channel SD latents (got C={args.latent_c}); "
                "16-channel Wan latents have no in-repo decoder")
        from ..models.sd_vae import SDVAE, load_sd_vae_safetensors

        vae = SDVAE()
        if args.vae_sd:
            vae_params = load_sd_vae_safetensors(args.vae_sd)
        else:
            vae_params = vae.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 1, 3, args.latent_h * 8, args.latent_w * 8)),
            )["params"]
        decode_fn = jax.jit(lambda z: vae.apply(
            {"params": vae_params}, z, method=SDVAE.decode))

    key = jax.random.PRNGKey(args.seed)
    rgb_psnrs, rgb_psnrs_lerp, rgb_ssims, rgb_ssims_lerp = [], [], [], []
    deltas, l1s, l1s_lerp, psnrs, ssims = [], [], [], [], []
    for bi in range(args.num_batches):
        batch = get_batch(bi)
        lat = jnp.asarray(batch["latents"], jnp.float32)
        key, k = jax.random.split(key)
        idx, mask = sample_fixed_k_indices_batch(k, lat.shape[0], args.T, args.K)
        lerp = _lerp(lat, idx)
        pred = interp_fn(lat, idx) if interp_fn is not None else lerp
        hidden = np.asarray(~mask)
        for b in range(lat.shape[0]):
            hb = hidden[b]
            p_np = np.asarray(pred[b])[hb]
            l_np = np.asarray(lerp[b])[hb]
            t_np = np.asarray(lat[b])[hb]
            l1 = float(np.abs(p_np - t_np).mean())
            l1_l = float(np.abs(l_np - t_np).mean())
            l1s.append(l1)
            l1s_lerp.append(l1_l)
            deltas.append(l1 - l1_l)
            psnrs.append(psnr(p_np, t_np))
            ssims.append(ssim(p_np, t_np))
        if decode_fn is not None:
            rgb_pred = np.asarray(decode_fn(pred))
            rgb_lerp = np.asarray(decode_fn(lerp))
            rgb_gt = np.asarray(decode_fn(lat))
            for b in range(lat.shape[0]):
                hb = hidden[b]
                rgb_psnrs.append(psnr(rgb_pred[b][hb], rgb_gt[b][hb], 1.0))
                rgb_psnrs_lerp.append(psnr(rgb_lerp[b][hb], rgb_gt[b][hb], 1.0))
                rgb_ssims.append(ssim(rgb_pred[b][hb], rgb_gt[b][hb]))
                rgb_ssims_lerp.append(ssim(rgb_lerp[b][hb], rgb_gt[b][hb]))
    deltas = np.asarray(deltas)
    report = {
        "interpolator": args.interpolator,
        "latent_l1": float(np.mean(l1s)),
        "lerp_l1": float(np.mean(l1s_lerp)),
        "l1_vs_lerp_pct": float(100.0 * (np.mean(l1s_lerp) - np.mean(l1s))
                                / max(np.mean(l1s_lerp), 1e-12)),
        "psnr": float(np.mean(psnrs)),
        "ssim": float(np.mean(ssims)),
        "outliers_worse_than_lerp": int((deltas > args.outlier_delta).sum()),
        "n_samples": int(deltas.size),
    }
    if rgb_psnrs:
        report.update({
            "rgb_psnr": float(np.mean(rgb_psnrs)),
            "rgb_psnr_lerp": float(np.mean(rgb_psnrs_lerp)),
            "rgb_ssim": float(np.mean(rgb_ssims)),
            "rgb_ssim_lerp": float(np.mean(rgb_ssims_lerp)),
        })
    out = json.dumps(report, indent=2)
    print(out)
    if args.out_json:
        with open(args.out_json, "w") as f:
            f.write(out)
    return report


if __name__ == "__main__":
    main()
