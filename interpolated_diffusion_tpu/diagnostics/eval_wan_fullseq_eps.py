"""Full-sequence eps-prediction MSE of a Wan DiT on wan-synth latents
(reference scripts/eval_wan_fullseq_eps_wansynth.py).

Sanity-checks how well a (pretrained or trained) Wan backbone predicts eps
on full-length T-frame noised latents under any attention mode — the
baseline number that the phase-1 short-mode training and the SLA
approximations are measured against. One jitted forward per batch; EMA of
the scalar on host.
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from ..ops.ddpm import q_sample
from ..ops.schedules import make_schedule
from ..train.wansynth_common import (
    add_wan_model_args,
    add_wansynth_data_args,
    build_wan,
    load_pretrained_into,
    make_wansynth_loader,
)


def main(argv=None):
    p = argparse.ArgumentParser("eval_wan_fullseq_eps")
    add_wansynth_data_args(p)
    add_wan_model_args(p)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--max_batches", type=int, default=8)
    p.add_argument("--N_train", type=int, default=1000)
    p.add_argument("--schedule", type=str, default="cosine")
    p.add_argument("--bf16", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log_every", type=int, default=1)
    args = p.parse_args(argv)
    args.lora_rank = 0

    loader = make_wansynth_loader(args, args.seed)
    schedule = make_schedule(args.schedule, args.N_train)
    wan = build_wan(args, bool(args.bf16))

    batch0 = next(loader)
    _, T, C, H, W = batch0["latents"].shape
    key = jax.random.PRNGKey(args.seed)
    params = wan.init(key, jnp.zeros((1, C, T, H, W)),
                      jnp.zeros((1,), jnp.int32),
                      jnp.zeros((1, 8, args.text_dim)))["params"]
    params = load_pretrained_into(params, args)

    @jax.jit
    def eps_mse(params, latents, text, t, eps):
        zt, _ = q_sample(latents.astype(jnp.float32), t, schedule, noise=eps)
        lat_in = jnp.transpose(zt, (0, 2, 1, 3, 4))
        pred = wan.apply({"params": params}, lat_in, t, text)
        pred = jnp.transpose(pred, (0, 2, 1, 3, 4)).astype(jnp.float32)
        return ((pred - eps) ** 2).mean(), t.astype(jnp.float32).mean()

    ema, ema_beta = 0.0, 0.98
    batch = batch0
    start = time.time()
    for step in range(args.max_batches):
        lat = jnp.asarray(batch["latents"])
        text = jnp.asarray(batch["text_embed"])
        key, k_t, k_e = jax.random.split(key, 3)
        t = jax.random.randint(k_t, (lat.shape[0],), 0, args.N_train)
        eps = jax.random.normal(k_e, lat.shape, jnp.float32)
        mse, t_mean = eps_mse(params, lat, text, t, eps)
        mse = float(mse)
        ema = mse if step == 0 else ema_beta * ema + (1 - ema_beta) * mse
        if step % args.log_every == 0:
            sps = (step + 1) * lat.shape[0] / max(time.time() - start, 1e-8)
            print(f"step {step}: mse_eps={mse:.5f} ema={ema:.5f} "
                  f"t_mean={float(t_mean):.0f} | {sps:.2f} samples/s")
        batch = next(loader)
    print({"mse_eps_ema": ema, "attn_mode": args.attn_mode, "T": T})
    return ema


if __name__ == "__main__":
    main()
