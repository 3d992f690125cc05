#!/usr/bin/env bash
# Round-5 smoothness fine-tune: continue il_boot16@10k for +1500 steps with
# the curvature-weighted error term (--smooth_weight 1.0) — the train-side
# attack on the ≤2x-interp smoothness clause (sampling-side smoothing
# already gives 0.0083 -> 0.0028 at held collision; this targets the
# model's own delta texture). Fine-tune lands in a COPY so the canonical
# boot16 arm stays intact.
set -u
cd "$(dirname "$0")/.."
LOG=runs/tpu_rundown_r5
mkdir -p "$LOG"
. scripts/rundown_lib.sh
B=runs/d4rl_r4
R5=runs/d4rl_r5

if [ ! -d "$R5/il_smw/ckpt_10000" ] && [ -d "$B/il_boot16/ckpt_10000" ]; then
  mkdir -p "$R5/il_smw"
  cp -r "$B/il_boot16/ckpt_10000" "$R5/il_smw/ckpt_10000"
fi
run_step smw_train 5400 python -m \
  interpolated_diffusion_tpu.train.train_interp_levels \
  --dataset prepared --T 128 --use_sdf 1 --maze_h 12 --maze_w 9 \
  --prepared_path $B/prep/train_dp.npz \
  --K_min 8 --levels 8 --k_schedule geom --mode adj --mask_policy uniform \
  --anchor_conf 1 --anchor_conf_anneal 1 --w_anchor 0.1 \
  --corrupt_mode dist --corrupt_sigma_max 0.02 \
  --corrupt_sigma_min 0.003 --corrupt_sigma_pow 0.75 \
  --corrupt_anchor_frac 0.25 --pos_clip 1 \
  --bootstrap_ckpt $B/kp --dphi_ckpt $B/dphi \
  --bootstrap_best_of 16 --bootstrap_best_of_mode dp \
  --bootstrap_ddim_steps 8 \
  --bootstrap_replace_prob 0.5 --bootstrap_warmup_steps 1 \
  --smooth_weight 1.0 \
  --resume $R5/il_smw \
  --steps 11500 --batch 256 --out_dir $R5/il_smw

SAMPLE_COMMON="--dataset prepared --prepared_path $B/prep/eval_dp.npz \
  --kp_index_mode uniform --dphi_ckpt $B/dphi \
  --stage1_best_of 16 --stage1_best_of_mode dp --stage1_cache_interval 2 \
  --s2_noise_mode none --soft_anchor_clamp 1 \
  --pos_clip 1 --compare_oracle 1 --num_batches 8 --batch 64 --sanity 1"
if need $R5/il_smw/ckpt_11500; then
  run_step smw_conf05 3600 python -m \
    interpolated_diffusion_tpu.sample.generate \
    --kp_ckpt $B/kp --interp_ckpt $R5/il_smw $SAMPLE_COMMON \
    --anchor_conf_override 0.5 \
    --out_dir $R5/samples_smw_conf05
  run_step smw_conf05_smooth2 3600 python -m \
    interpolated_diffusion_tpu.sample.generate \
    --kp_ckpt $B/kp --interp_ckpt $R5/il_smw $SAMPLE_COMMON \
    --anchor_conf_override 0.5 --s2_delta_smooth 2 \
    --out_dir $R5/samples_smw_conf05_smooth2
fi
echo "rundown r5g done $(date -Is)"
