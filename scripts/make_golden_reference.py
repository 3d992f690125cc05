"""Generate golden parity values by RUNNING the PyTorch reference.

Executes the reference implementation (REFERENCE_ROOT, default
/root/reference) on fixed deterministic inputs and dumps its outputs to
tests/golden/reference_golden.npz. tests/test_golden_parity.py then checks
the JAX ops against these values within tolerance — the cross-implementation
acceptance gate called for by SURVEY.md §4 ("add golden tests that load
values produced by the torch reference").

Only deterministic ops are captured (RNG-dependent builders are covered by
invariant tests instead — torch and JAX RNG streams cannot match).

Run on a machine that has the reference checkout:
    python scripts/make_golden_reference.py
The resulting npz is committed so CI does not need the reference.
"""
from __future__ import annotations

import os
import sys

import numpy as np

REF = os.environ.get("REFERENCE_ROOT", "/root/reference")
sys.path.insert(0, REF)

import torch  # noqa: E402

torch.manual_seed(0)

from src.diffusion.schedules import make_alpha_bars, make_beta_schedule  # noqa: E402
from src.diffusion import ddpm  # noqa: E402
from src.corruptions.keyframes import (  # noqa: E402
    _compute_k_schedule,
    interpolate_from_indices,
    interpolate_from_mask,
)
from src.corruptions.video_keyframes import (  # noqa: E402
    _distance_alpha,
    _smooth_latents,
    interpolate_video_from_indices,
)
from src.selection import epiplexity_dp as dp  # noqa: E402
from src.selection.oracle_segment_cost import (  # noqa: E402
    build_oracle_seg_precompute,
    compute_oracle_cost_seg_mse,
)
from src.utils.clamp import apply_clamp, apply_soft_clamp  # noqa: E402
from src.utils.normalize import logit_pos, sigmoid_pos  # noqa: E402
from src.utils.frame_features import frame_features_from_mask  # noqa: E402
from src.utils.video_tokens import patchify_latents, unpatchify_tokens  # noqa: E402
from src.eval.metrics import compute_metrics_batch  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                   "reference_golden.npz")

rng = np.random.default_rng(20260816)
out: dict[str, np.ndarray] = {}


def t32(a):
    # copy=True: several reference ops (apply_clamp "pos") mutate their input
    # in place; from_numpy would share the buffer and corrupt saved inputs.
    return torch.from_numpy(np.array(a, np.float32, copy=True))


def save(name, val):
    if isinstance(val, torch.Tensor):
        val = val.detach().cpu().numpy()
    out[name] = np.asarray(val)


# --- schedules -------------------------------------------------------------
N_TRAIN = 100
for name in ("linear", "cosine"):
    betas = make_beta_schedule(name, N_TRAIN)
    sched = make_alpha_bars(betas)
    for k, v in sched.items():
        save(f"sched/{name}/{k}", v)

sched_lin = make_alpha_bars(make_beta_schedule("linear", N_TRAIN))

# --- ddpm core (explicit noise; deterministic paths only) ------------------
B, T, D = 4, 16, 2
x0 = rng.standard_normal((B, T, D)).astype(np.float32)
noise = rng.standard_normal((B, T, D)).astype(np.float32)
eps_hat = rng.standard_normal((B, T, D)).astype(np.float32)
t_vec = np.array([0, 13, 57, 99], np.int64)
t_prev = np.array([0, 4, 31, 76], np.int64)
save("ddpm/x0", x0)
save("ddpm/noise", noise)
save("ddpm/eps_hat", eps_hat)
save("ddpm/t", t_vec)
save("ddpm/t_prev", t_prev)

xt, _ = ddpm.q_sample(t32(x0), torch.from_numpy(t_vec), sched_lin, noise=t32(noise))
save("ddpm/q_sample", xt)
save("ddpm/x0_from_eps", ddpm.predict_x0_from_eps(xt, t32(eps_hat),
                                                  torch.from_numpy(t_vec), sched_lin))
save("ddpm/ddim_step", ddpm.ddim_step(xt, t32(eps_hat), torch.from_numpy(t_vec),
                                      torch.from_numpy(t_prev), sched_lin, eta=0.0))
# per-token [B,T] timesteps (keyframe-masked noising path)
t_tok = rng.integers(0, N_TRAIN, (B, T)).astype(np.int64)
save("ddpm/t_tok", t_tok)
xt_tok, _ = ddpm.q_sample(t32(x0), torch.from_numpy(t_tok), sched_lin, noise=t32(noise))
save("ddpm/q_sample_tok", xt_tok)

for sch in ("linear", "quadratic", "sqrt"):
    for steps in (5, 20, 99, 150):
        save(f"ddpm/timesteps/{sch}/{steps}",
             ddpm._timesteps(N_TRAIN, steps, schedule=sch))

# --- keyframe interpolation ------------------------------------------------
T_I, K_I = 32, 5
idx = np.stack([
    np.sort(np.concatenate([[0, T_I - 1],
                            rng.choice(np.arange(1, T_I - 1), K_I - 2, replace=False)]))
    for _ in range(B)
]).astype(np.int64)
vals4 = rng.standard_normal((B, K_I, 4)).astype(np.float32)
save("interp/idx", idx)
save("interp/vals4", vals4)
save("interp/out", interpolate_from_indices(torch.from_numpy(idx), t32(vals4), T_I))
save("interp/out_vel", interpolate_from_indices(torch.from_numpy(idx), t32(vals4),
                                                T_I, recompute_velocity=True))
# interior (non-endpoint-anchored) anchors: frames outside the hull keep x
idx_in = np.stack([
    np.sort(rng.choice(np.arange(2, T_I - 2), K_I, replace=False))
    for _ in range(B)
]).astype(np.int64)
x_full = rng.standard_normal((B, T_I, 4)).astype(np.float32)
mask_in = np.zeros((B, T_I), bool)
np.put_along_axis(mask_in, idx_in, True, axis=1)
save("interp/idx_in", idx_in)
save("interp/x_full", x_full)
save("interp/mask_in", mask_in)
save("interp/from_mask", interpolate_from_mask(t32(x_full), torch.from_numpy(mask_in)))

for sch in ("doubling", "linear", "geom"):
    kw = {"geom_gamma": 1.7} if sch == "geom" else {}
    save(f"interp/k_schedule/{sch}",
         np.asarray(_compute_k_schedule(64, 8, 3, schedule=sch, **kw), np.int64))

# --- video corruption helpers ---------------------------------------------
save("video/distance_alpha", _distance_alpha(torch.from_numpy(idx), T_I))
kernel = torch.tensor([0.25, 0.5, 0.25], dtype=torch.float32)
z_flat = rng.standard_normal((B, T_I, 6)).astype(np.float32)
save("video/z_flat", z_flat)
save("video/smooth_kernel", kernel)
save("video/smooth", _smooth_latents(t32(z_flat), kernel))
vals6 = rng.standard_normal((B, K_I, 6)).astype(np.float32)
save("video/vals6", vals6)
save("video/interp_linear",
     interpolate_video_from_indices(torch.from_numpy(idx), t32(vals6), T_I, mode="linear"))
save("video/interp_smooth",
     interpolate_video_from_indices(torch.from_numpy(idx), t32(vals6), T_I,
                                    mode="smooth", smooth_kernel=kernel))

# --- selection / DP --------------------------------------------------------
snr, weights = dp.build_snr_weights("linear", N_TRAIN, 0.05, 20.0, 0.5)
save("sel/snr", snr)
save("sel/snr_weights", weights)
save("sel/log_snr_steps", dp.sample_timesteps_log_snr(snr, 12))

T_S = 24
pre = dp.build_segment_precompute(T_S, 4, torch.device("cpu"))
save("sel/seg_i", pre.seg_i)
save("sel/seg_j", pre.seg_j)
save("sel/seg_len", pre.seg_len)
save("sel/t_idx", pre.t_idx)
save("sel/alpha", pre.alpha)
save("sel/weight", pre.weight)
save("sel/seg_feat", dp.build_segment_features(T_S, pre.seg_i, pre.seg_j))
save("sel/seg_feat_idx",
     dp.build_segment_features_from_idx(torch.from_numpy(idx), T_I, seg_feat_dim=5))

x_pos = rng.standard_normal((B, T_S, 2)).astype(np.float32).cumsum(axis=1)
x_pos = (x_pos - x_pos.min()) / (x_pos.max() - x_pos.min())
save("sel/x_pos", x_pos)
cost_seg = dp.compute_segment_costs_batch(t32(x_pos), pre, weight_scale=1.0)
save("sel/cost_seg", cost_seg)
C = dp.build_cost_matrix_from_segments_batch(cost_seg, pre, T_S)
save("sel/dp_idx", dp.dp_select_indices_batch(C, 6))
save("sel/kp_feat", dp.build_kp_feat_batch(torch.from_numpy(idx), T_I))

# --- oracle segment cost ---------------------------------------------------
T_O, C_O, H_O, W_O = 9, 3, 4, 4
z_vid = rng.standard_normal((2, T_O, C_O, H_O, W_O)).astype(np.float32)
save("oracle/z_vid", z_vid)
pre_o = build_oracle_seg_precompute(T_O, device=torch.device("cpu"))
save("oracle/cost", compute_oracle_cost_seg_mse(t32(z_vid), pre_o))

# --- utils -----------------------------------------------------------------
x_hat = rng.standard_normal((B, T_I, 4)).astype(np.float32)
x_ref = rng.standard_normal((B, T_I, 4)).astype(np.float32)
cmask = rng.random((B, T_I)) < 0.3
conf = rng.random((B, T_I)).astype(np.float32)
save("clamp/x_hat", x_hat)
save("clamp/x_ref", x_ref)
save("clamp/mask", cmask)
save("clamp/conf", conf)
save("clamp/hard_pos", apply_clamp(t32(x_hat), t32(x_ref), torch.from_numpy(cmask), "pos"))
save("clamp/hard_all", apply_clamp(t32(x_hat), t32(x_ref), torch.from_numpy(cmask), "all"))
save("clamp/soft", apply_soft_clamp(t32(x_hat), t32(x_ref), t32(conf), 0.35, "pos"))

xpos01 = rng.random((B, T_I, 4)).astype(np.float32)
save("norm/x", xpos01)
save("norm/logit", logit_pos(t32(xpos01)))
save("norm/sigmoid", sigmoid_pos(logit_pos(t32(xpos01))))

fmask = rng.random((B, 24)) < 0.25
fmask[2] = False  # no-anchor fallback row
save("ff/mask", fmask)
save("ff/with_time", frame_features_from_mask(torch.from_numpy(fmask), include_time=True))
save("ff/no_time", frame_features_from_mask(torch.from_numpy(fmask), include_time=False))

lat = rng.standard_normal((2, 3, 8, 6, 4)).astype(np.float32)  # [B,T,C,H,W]
save("tok/latents", lat)
tokens, (hp, wp) = patchify_latents(t32(lat), 2)
save("tok/tokens", tokens)
save("tok/spatial", np.array([hp, wp], np.int64))
save("tok/roundtrip", unpatchify_tokens(tokens, 2, (hp, wp)))

# --- native-op ports (grid_sample / resize / pool / log-Sinkhorn) ----------
import torch.nn.functional as F  # noqa: E402
from src.models.sinkhorn_warp import _sinkhorn_log_batch  # noqa: E402

img = rng.standard_normal((2, 3, 8, 10)).astype(np.float32)
# grid in [-1.15, 1.15] exercises the border clamp
grid = (rng.random((2, 5, 7, 2)).astype(np.float32) * 2.3) - 1.15
save("img/x", img)
save("img/grid", grid)
save("img/grid_sample_border",
     F.grid_sample(t32(img), t32(grid), mode="bilinear", padding_mode="border",
                   align_corners=True))
save("img/resize_up", F.interpolate(t32(img), size=(16, 20), mode="bilinear",
                                    align_corners=False))
save("img/avg_pool2", F.avg_pool2d(t32(img), 2))
logits_sk = rng.standard_normal((3, 6, 6)).astype(np.float32) * 2.0
save("sk/logits", logits_sk)
save("sk/log_plan", _sinkhorn_log_batch(t32(logits_sk), 12))

# --- eval metrics ----------------------------------------------------------
occ = (rng.random((B, 8, 8)) < 0.2).astype(np.float32)
occ[:, 0, :] = occ[:, -1, :] = occ[:, :, 0] = occ[:, :, -1] = 0.0
traj = rng.random((B, 20, 2)).astype(np.float32)
goal = rng.random((B, 2)).astype(np.float32)
gt = rng.random((B, 20, 2)).astype(np.float32)
save("metrics/occ", occ)
save("metrics/traj", traj)
save("metrics/goal", goal)
save("metrics/gt", gt)
m = compute_metrics_batch(t32(occ), t32(traj), t32(goal), gt=t32(gt))
for k, v in m.items():
    save(f"metrics/{k}", v)

os.makedirs(os.path.dirname(OUT), exist_ok=True)
np.savez_compressed(OUT, **out)
print(f"wrote {len(out)} arrays -> {os.path.abspath(OUT)}")

# ---------------------------------------------------------------------------
# Model-level goldens: reference denoiser state_dicts + forward outputs.
# tests/test_torch_import.py converts these state_dicts with
# models/torch_import.py and requires forward agreement — validating the
# reference-checkpoint migration path end to end.
# ---------------------------------------------------------------------------
from src.models.denoiser_keypoints import KeypointDenoiser  # noqa: E402
from src.models.denoiser_interp_levels import InterpLevelDenoiser  # noqa: E402
from src.models.denoiser_interp_levels_causal import (  # noqa: E402
    InterpLevelCausalDenoiser,
)

OUT_M = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                     "reference_models.npz")
mout: dict[str, np.ndarray] = {}


def msave(name, val):
    if isinstance(val, torch.Tensor):
        val = val.detach().cpu().numpy()
    mout[name] = np.asarray(val)


def dump_sd(model, prefix):
    for k, v in model.state_dict().items():
        msave(f"{prefix}/sd/{k}", v)


torch.manual_seed(7)
B_M, T_M, K_M, GRID = 3, 24, 6, 11
KP_KW = dict(d_model=64, n_layers=2, n_heads=4, d_ff=128, d_cond=32,
             use_start_goal=True, data_dim=2, kp_feat_dim=3,
             maze_channels=(8, 16))
kp_ref = KeypointDenoiser(**KP_KW).eval()
dump_sd(kp_ref, "kp")

z_t = rng.standard_normal((B_M, K_M, 2)).astype(np.float32)
t_m = np.array([3, 50, 97], np.int64)
idx_m = np.stack([np.sort(np.concatenate(
    [[0, T_M - 1], rng.choice(np.arange(1, T_M - 1), K_M - 2, replace=False)]))
    for _ in range(B_M)]).astype(np.int64)
known_m = np.zeros((B_M, K_M, 2), bool)
known_m[:, 0] = known_m[:, -1] = True
occ_m = (rng.random((B_M, 1, GRID, GRID)) < 0.25).astype(np.float32)
sg_m = rng.random((B_M, 4)).astype(np.float32)
kpf_m = rng.standard_normal((B_M, K_M, 3)).astype(np.float32)
for name, val in [("z_t", z_t), ("t", t_m), ("idx", idx_m), ("known", known_m),
                  ("occ", occ_m), ("start_goal", sg_m), ("kp_feat", kpf_m)]:
    msave(f"kp/in/{name}", val)
with torch.no_grad():
    eps_ref = kp_ref(t32(z_t), torch.from_numpy(t_m), torch.from_numpy(idx_m),
                     torch.from_numpy(known_m),
                     {"occ": t32(occ_m), "start_goal": t32(sg_m),
                      "kp_feat": t32(kpf_m)}, T_M)
msave("kp/out", eps_ref)

IT_KW = dict(d_model=64, n_layers=2, n_heads=4, d_ff=128, d_cond=32,
             use_start_goal=True, data_dim=2, max_levels=8, mask_channels=2,
             maze_channels=(8, 16))
it_ref = InterpLevelDenoiser(**IT_KW).eval()
dump_sd(it_ref, "it")
x_s = rng.standard_normal((B_M, T_M, 2)).astype(np.float32)
s_m = np.array([1, 2, 3], np.int64)
mask2 = (rng.random((B_M, T_M, 2)) < 0.3).astype(np.float32)
for name, val in [("x_s", x_s), ("s", s_m), ("mask", mask2)]:
    msave(f"it/in/{name}", val)
with torch.no_grad():
    d_ref = it_ref(t32(x_s), torch.from_numpy(s_m), t32(mask2),
                   {"occ": t32(occ_m), "start_goal": t32(sg_m)})
msave("it/out", d_ref)

itc_ref = InterpLevelCausalDenoiser(**{**IT_KW, "mask_channels": 1}).eval()
dump_sd(itc_ref, "itc")
mask1 = (rng.random((B_M, T_M)) < 0.3).astype(np.float32)
msave("itc/in/mask", mask1)
with torch.no_grad():
    dc_ref = itc_ref(t32(x_s), torch.from_numpy(s_m), t32(mask1),
                     {"occ": t32(occ_m), "start_goal": t32(sg_m)})
msave("itc/out", dc_ref)

from src.models.keypoint_selector import KeypointSelector  # noqa: E402
from src.models.segment_cost import SegmentCostPredictor  # noqa: E402

SEL_KW = dict(T=T_M, d_model=32, n_heads=4, d_ff=64, n_layers=2, pos_dim=16,
              use_sdf=False, use_start_goal=True, use_sg_map=True,
              use_sg_token=True, use_goal_dist_token=True, use_cond_bias=True,
              cond_bias_mode="memory", use_level=True, sg_map_sigma=1.5,
              maze_channels=(8, 16))
sel_ref = KeypointSelector(**SEL_KW).eval()
dump_sd(sel_ref, "sel")
lvl_m = np.array([[1.0], [2.0], [0.0]], np.float32)
msave("sel/in/level", lvl_m)
with torch.no_grad():
    logits_ref = sel_ref({"occ": t32(occ_m), "start_goal": t32(sg_m),
                          "level": t32(lvl_m)})
msave("sel/out", logits_ref)

DPHI_KW = dict(d_cond=32, seg_feat_dim=3, hidden_dim=48, n_layers=3,
               use_sdf=False, use_start_goal=True, maze_channels=(8, 16))
dphi_ref = SegmentCostPredictor(**DPHI_KW).eval()
dump_sd(dphi_ref, "dphi")
segf_m = rng.random((B_M, 10, 3)).astype(np.float32)
msave("dphi/in/seg_feat", segf_m)
with torch.no_grad():
    cost_ref = dphi_ref({"occ": t32(occ_m), "start_goal": t32(sg_m)}, t32(segf_m))
msave("dphi/out", cost_ref)

from src.models.video_token_denoisers import (  # noqa: E402
    VideoTokenInterpLevelDenoiser,
    VideoTokenKeypointDenoiser,
)
from src.models.encoders import TextConditionEncoder  # noqa: E402

VK_KW = dict(d_model=48, n_layers=2, n_heads=4, d_ff=96, d_cond=24, data_dim=20)
TEXT_DIM = 32
vk_ref = VideoTokenKeypointDenoiser(
    cond_encoder=TextConditionEncoder(text_dim=TEXT_DIM, d_cond=24), **VK_KW).eval()
dump_sd(vk_ref, "vk")
T_V, K_V, HP, WP = 10, 4, 2, 3
N_V = HP * WP
zv = rng.standard_normal((B_M, K_V, N_V, 20)).astype(np.float32)
tv = np.array([5, 40, 90], np.int64)
idx_v = np.stack([np.sort(rng.choice(np.arange(T_V), K_V, replace=False))
                  for _ in range(B_M)]).astype(np.int64)
text_v = rng.standard_normal((B_M, 7, TEXT_DIM)).astype(np.float32)
for name, val in [("z", zv), ("t", tv), ("idx", idx_v), ("text", text_v)]:
    msave(f"vk/in/{name}", val)
with torch.no_grad():
    vk_out = vk_ref(t32(zv), torch.from_numpy(tv), torch.from_numpy(idx_v),
                    {"text_embed": t32(text_v)}, T_V, (HP, WP))
msave("vk/out", vk_out)

vi_ref = VideoTokenInterpLevelDenoiser(
    cond_encoder=TextConditionEncoder(text_dim=TEXT_DIM, d_cond=24),
    mask_channels=2, max_levels=8, **VK_KW).eval()
dump_sd(vi_ref, "vi")
xv = rng.standard_normal((B_M, T_V, N_V, 20)).astype(np.float32)
sv = np.array([1, 3, 2], np.int64)
maskv = (rng.random((B_M, T_V, N_V, 2)) < 0.4).astype(np.float32)
for name, val in [("x", xv), ("s", sv), ("mask", maskv)]:
    msave(f"vi/in/{name}", val)
with torch.no_grad():
    vi_out = vi_ref(t32(xv), torch.from_numpy(sv), t32(maskv),
                    {"text_embed": t32(text_v)}, (HP, WP))
msave("vi/out", vi_out)

from src.models.video_interpolator import TinyTemporalInterpolator  # noqa: E402

ti_ref = TinyTemporalInterpolator(data_dim=12, kernel_size=3, n_layers=2).eval()
dump_sd(ti_ref, "ti")
zt_in = rng.standard_normal((B_M, 9, 12)).astype(np.float32)
msave("ti/in/z", zt_in)
with torch.no_grad():
    msave("ti/out", ti_ref(t32(zt_in)))

np.savez_compressed(OUT_M, **mout)
print(f"wrote {len(mout)} arrays -> {os.path.abspath(OUT_M)}")
