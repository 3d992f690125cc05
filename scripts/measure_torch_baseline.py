"""Measure the reference PyTorch end-to-end pipeline (step 0 of BASELINE.md).

Runs the reference implementation (imported from /root/reference, NOT copied)
on the same workload as bench.py: Stage-1 20-step DDIM over K=8 keypoints →
interpolate_from_indices → Stage-2 3-level adjacent refinement over T=64, at
the reference's default model sizes, batch 256, inference mode.

Hardware note: this container has CPU-only torch; the reference targets an
RTX 4090 (README.md:8) but published no numbers (BASELINE.json
"published": {}). The result is stored in BENCH_BASELINE.json with a
hardware tag so vs_baseline ratios are interpretable.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/reference")

import torch

from src.diffusion.ddpm import ddim_step, _timesteps
from src.diffusion.schedules import make_alpha_bars, make_beta_schedule
from src.corruptions.keyframes import (
    build_nested_masks_from_base,
    interpolate_from_indices,
    sample_fixed_k_indices_batch,
)
from src.models.denoiser_keypoints import KeypointDenoiser
from src.models.denoiser_interp_levels import InterpLevelDenoiser

B, T, K, LEVELS = 256, 64, 8, 3
DDIM_STEPS, N_TRAIN = 20, 100
ITERS = 3

device = torch.device("cuda" if torch.cuda.is_available() else "cpu")
torch.set_grad_enabled(False)

kp = KeypointDenoiser(
    d_model=384, n_layers=12, n_heads=12, d_ff=1536, d_cond=128,
    data_dim=2, maze_channels=(32, 64, 128, 128),
).to(device).eval()
interp = InterpLevelDenoiser(
    d_model=384, n_layers=12, n_heads=12, d_ff=1536, d_cond=128,
    data_dim=2, mask_channels=2, maze_channels=(32, 64, 128, 128),
).to(device).eval()

schedule = make_alpha_bars(make_beta_schedule("linear", N_TRAIN))
schedule = {k: v.to(device) for k, v in schedule.items()}
gen = torch.Generator().manual_seed(0)
cond = {
    "occ": (torch.rand(B, 1, 21, 21) < 0.2).float().to(device),
    "start_goal": torch.rand(B, 4).to(device),
}
idx, _ = sample_fixed_k_indices_batch(B, T, K, generator=gen)
idx = idx.to(device)
known_mask = torch.zeros((B, K, 2), dtype=torch.bool, device=device)
known_mask[:, 0, :] = True
known_mask[:, -1, :] = True
known_values = torch.zeros((B, K, 2), device=device)
times = _timesteps(N_TRAIN, DDIM_STEPS)


def run_once(seed: int):
    g = torch.Generator().manual_seed(seed)
    z = torch.randn((B, K, 2), generator=g).to(device)
    z = torch.where(known_mask, known_values, z)
    for i in range(len(times) - 1):
        t = torch.full((B,), int(times[i]), device=device, dtype=torch.long)
        tp = torch.full((B,), int(times[i + 1]), device=device, dtype=torch.long)
        eps = kp(z, t, idx, known_mask, cond, T)
        z = ddim_step(z, eps, t, tp, schedule)
        z = torch.where(known_mask, known_values, z)
    x = interpolate_from_indices(idx, z, T)
    masks_levels, _ = build_nested_masks_from_base(idx.cpu(), T, LEVELS, generator=g)
    masks_levels = masks_levels.to(device)
    for s in range(LEVELS, 0, -1):
        mask_in = torch.stack(
            [masks_levels[:, s].float(), masks_levels[:, s - 1].float()], dim=-1
        )
        s_level = torch.full((B,), s, device=device, dtype=torch.long)
        x = x + interp(x, s_level, mask_in, cond)
    return x


run_once(0)  # warmup
t0 = time.time()
for i in range(ITERS):
    out = run_once(i + 1)
if device.type == "cuda":
    torch.cuda.synchronize()
dt = time.time() - t0
sps = B * ITERS / dt

result = {
    "samples_per_sec": round(sps, 2),
    "hardware": torch.cuda.get_device_name(0) if device.type == "cuda" else "CPU (torch)",
    "config": {"B": B, "T": T, "K": K, "levels": LEVELS, "ddim_steps": DDIM_STEPS,
               "d_model": 384, "n_layers": 12},
    "note": "reference PyTorch implementation, inference mode; see BASELINE.md",
}
out_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "BENCH_BASELINE.json")
with open(out_path, "w") as f:
    json.dump(result, f, indent=2)
print(json.dumps(result))
