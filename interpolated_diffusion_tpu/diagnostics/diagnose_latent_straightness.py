"""Latent straightness diagnostics on wan-synth latents.

Capability parity with reference scripts/diagnose_latent_straightness_wansynth.py:
per-batch temporal curvature (|z_{t+1} - 2 z_t + z_{t-1}|) and barycentric
linearity via random triplets (LERP error vs copy-endpoint baseline, bucketed
by gap), plus the same measurements in a trained straightener's space
(s-space LERP error, z-from-s decode error, s-space curvature).

TPU-native stance: all measurement math is one jitted function over the
batch; triplet index sampling is host-side numpy (rejection loops stay off
the device).
"""
from __future__ import annotations

import argparse
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..train.wansynth_common import add_wansynth_data_args, make_wansynth_loader


def sample_triplets(B: int, T: int, min_gap: int, rng: np.random.RandomState):
    """(t0, t1, t, alpha) with t0 + min_gap <= t1, t strictly interior."""
    if T <= 2:
        raise ValueError("T must be >= 3 to sample triplets")
    min_gap = max(2, int(min_gap))
    t0 = np.empty(B, np.int64)
    t1 = np.empty(B, np.int64)
    todo = np.ones(B, bool)
    while todo.any():
        n = int(todo.sum())
        a = rng.randint(0, T - 1, size=n)
        b = rng.randint(0, T - 1, size=n)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        ok = (hi - lo) >= min_gap
        sel = np.flatnonzero(todo)[ok]
        t0[sel], t1[sel] = lo[ok], hi[ok]
        todo[sel] = False
    gap = t1 - t0
    t = t0 + 1 + np.floor(rng.rand(B) * (gap - 1)).astype(np.int64)
    alpha = (t - t0).astype(np.float32) / np.maximum(gap, 1)
    return t0, t1, t, alpha


def _err(a, b, loss_type: str):
    d = (a - b).astype(jnp.float32)
    axes = tuple(range(1, d.ndim))
    if loss_type == "l2":
        return jnp.sqrt((d ** 2).mean(axis=axes))
    return jnp.abs(d).mean(axis=axes)


def bucket_stats(gaps: np.ndarray, errs: np.ndarray, buckets):
    out = []
    for lo, hi in buckets:
        m = (gaps >= lo) & (gaps <= hi)
        out.append((lo, hi,
                    float(errs[m].mean()) if m.any() else math.nan,
                    int(m.sum())))
    return out


def main(argv=None):
    p = argparse.ArgumentParser("diagnose_latent_straightness")
    add_wansynth_data_args(p)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--num_batches", type=int, default=20)
    p.add_argument("--min_gap", type=int, default=2)
    p.add_argument("--loss_type", type=str, default="l1", choices=["l1", "l2"])
    p.add_argument("--straightener_ckpt", type=str, default="")
    p.add_argument("--seed", type=int, default=1234)
    args = p.parse_args(argv)

    loader = make_wansynth_loader(args, args.seed)
    rng = np.random.RandomState(args.seed)
    T = args.T

    straightener = None
    if args.straightener_ckpt:
        from ..models.straightener import load_latent_straightener

        straightener, s_params, _ = load_latent_straightener(
            args.straightener_ckpt,
            sample_hw=(args.latent_h, args.latent_w))

    @jax.jit
    def measure(latents, t0, t1, t, alpha):
        lat = latents.astype(jnp.float32)       # [B,T,C,H,W]
        # temporal curvature on the true sequence
        z_prev, z_mid, z_next = lat[:, :-2], lat[:, 1:-1], lat[:, 2:]
        d2 = _err(z_next + z_prev, 2.0 * z_mid, args.loss_type)
        span = _err(z_next, z_prev, args.loss_type)
        out = {"curv": d2, "curv_ratio": d2 / (span + 1e-8)}

        take = lambda ti: jnp.take_along_axis(
            lat, ti[:, None, None, None, None], axis=1)[:, 0]
        z0, z1, zt = take(t0), take(t1), take(t)
        a4 = alpha[:, None, None, None]
        z_lerp = (1.0 - a4) * z0 + a4 * z1
        out["lerp"] = _err(z_lerp, zt, args.loss_type)
        out["copy"] = jnp.minimum(_err(z0, zt, args.loss_type),
                                  _err(z1, zt, args.loss_type))

        if straightener is not None:
            enc = lambda z: straightener.apply(
                {"params": s_params}, z, method="encode")
            s0, s1, st = enc(z0), enc(z1), enc(zt)
            s_lerp = (1.0 - a4) * s0 + a4 * s1
            z_from_s = straightener.apply(
                {"params": s_params}, s_lerp, method="decode")
            out["s_lerp"] = _err(s_lerp, st, args.loss_type)
            out["z_from_s"] = _err(z_from_s, zt, args.loss_type)
            B, C, H, W = z0.shape
            flatten = lambda z5: z5.reshape((-1,) + z5.shape[2:])
            sp = enc(flatten(lat[:, :-2])).reshape(B, T - 2, C, H, W)
            sm = enc(flatten(lat[:, 1:-1])).reshape(B, T - 2, C, H, W)
            sn = enc(flatten(lat[:, 2:])).reshape(B, T - 2, C, H, W)
            s_d2 = _err(sn + sp, 2.0 * sm, args.loss_type)
            s_span = _err(sn, sp, args.loss_type)
            out["s_curv"] = s_d2
            out["s_curv_ratio"] = s_d2 / (s_span + 1e-8)
        return out

    acc = {}
    gaps_all = []
    for _ in range(args.num_batches):
        batch = next(loader)
        lat = jnp.asarray(batch["latents"])
        B = lat.shape[0]
        t0, t1, t, alpha = sample_triplets(B, T, args.min_gap, rng)
        res = measure(lat, jnp.asarray(t0), jnp.asarray(t1), jnp.asarray(t),
                      jnp.asarray(alpha))
        for k, v in res.items():
            acc.setdefault(k, []).append(np.asarray(v))
        gaps_all.append(t1 - t0)

    agg = {k: np.concatenate(v) for k, v in acc.items()}
    gaps = np.concatenate(gaps_all)
    label = "L2" if args.loss_type == "l2" else "L1"
    print("\n=== Latent Straightness Diagnostics (raw latents) ===")
    print(f"samples (triplets): {agg['lerp'].size}")
    print(f"LERP {label} (mean): {agg['lerp'].mean():.6f}")
    print(f"Copy-endpoint {label} (mean): {agg['copy'].mean():.6f}")
    print(f"LERP improvement vs copy: {agg['copy'].mean() - agg['lerp'].mean():.3f}")
    print(f"Temporal curvature {label} (mean): {agg['curv'].mean():.6f}")
    print(f"Temporal curvature ratio (mean): {agg['curv_ratio'].mean():.6f}")
    if "s_lerp" in agg:
        print("\n--- Straightened space ---")
        print(f"S-space LERP {label} (mean): {agg['s_lerp'].mean():.6f}")
        print(f"Z from S-LERP {label} (mean): {agg['z_from_s'].mean():.6f}")
        print(f"S-space curvature {label} (mean): {agg['s_curv'].mean():.6f}")
        print(f"S-space curvature ratio (mean): {agg['s_curv_ratio'].mean():.6f}")
    buckets = [(2, 3), (4, 6), (7, 10), (11, 20)]
    print(f"\nLERP {label} by gap bucket:")
    for lo, hi, val, n in bucket_stats(gaps, agg["lerp"], buckets):
        print(f"  gap {lo:02d}-{hi:02d}: {val:.6f} (n={n})")
    print(f"Copy {label} by gap bucket:")
    for lo, hi, val, n in bucket_stats(gaps, agg["copy"], buckets):
        print(f"  gap {lo:02d}-{hi:02d}: {val:.6f} (n={n})")
    return agg


if __name__ == "__main__":
    main()
