#!/usr/bin/env bash
# Retrain the D4RL T=128 Stage-2 with bootstrap anchors drawn from the dp
# best-of-16 distribution (the best sampler's own anchor selection), then
# A/B it under dp best-of-16 sampling against the same Stage-1 — the
# "Stage-2 earns its place under the BEST config" experiment on the
# headline dataset (VERDICT weak #2; maze analogue: maze_il_boot16).
# Assumes a finished run_d4rl_unified.sh layout at BASE.
set -euo pipefail
cd "$(dirname "$0")/../.."
RUNNER=${RUNNER:-python -m}

BASE=${BASE:-runs/d4rl_r3}
T=${T:-128}; K=${K:-8}; LEVELS=${LEVELS:-8}; K_SCHEDULE=${K_SCHEDULE:-geom}
S2_STEPS=${S2_STEPS:-10000}; BATCH=${BATCH:-256}
GRID_H=$(python -c "import numpy as np; print(np.load('$BASE/prep/train_dp.npz')['occ'].shape[2])")
GRID_W=$(python -c "import numpy as np; print(np.load('$BASE/prep/train_dp.npz')['occ'].shape[3])")
COMMON="--dataset prepared --T $T --use_sdf 1 --maze_h $GRID_H --maze_w $GRID_W"

$RUNNER interpolated_diffusion_tpu.train.train_interp_levels \
  $COMMON --prepared_path "$BASE/prep/train_dp.npz" \
  --K_min "$K" --levels "$LEVELS" --k_schedule "$K_SCHEDULE" --mode adj \
  --mask_policy uniform \
  --anchor_conf 1 --anchor_conf_anneal 1 --w_anchor 0.1 \
  --corrupt_mode dist --corrupt_sigma_max 0.02 \
  --corrupt_sigma_min 0.003 --corrupt_sigma_pow 0.75 \
  --corrupt_anchor_frac 0.25 --pos_clip 1 \
  --bootstrap_ckpt "$BASE/kp" --dphi_ckpt "$BASE/dphi" \
  --bootstrap_best_of "${BOOT_BEST_OF:-16}" --bootstrap_best_of_mode dp \
  --bootstrap_ddim_steps "${BOOT_DDIM_STEPS:-8}" \
  --bootstrap_replace_prob "${BOOT_REPLACE_PROB:-0.5}" \
  --bootstrap_warmup_steps "${BOOT_WARMUP:-2000}" \
  --steps "$S2_STEPS" --batch "$BATCH" --out_dir "$BASE/il_boot16"

# A/B 1: sampling identical to samples_bestof16 (level noise) — isolates
# the training-distribution effect
$RUNNER interpolated_diffusion_tpu.sample.generate \
  --kp_ckpt "$BASE/kp" --interp_ckpt "$BASE/il_boot16" \
  --dataset prepared --prepared_path "$BASE/prep/eval_dp.npz" \
  --kp_index_mode uniform --dphi_ckpt "$BASE/dphi" \
  --stage1_best_of 16 --stage1_best_of_mode dp --stage1_cache_interval 2 \
  --s2_noise_mode level --s2_noise_sigma 0.003 \
  --pos_clip 1 --compare_oracle 1 --num_batches 8 --batch 64 \
  --sanity 1 --out_dir "$BASE/samples_bestof16_boot16"

# A/B 2: the ablation-winning sampling config (no noise + soft anchor
# clamp) on the same checkpoint — the best-of-everything number
$RUNNER interpolated_diffusion_tpu.sample.generate \
  --kp_ckpt "$BASE/kp" --interp_ckpt "$BASE/il_boot16" \
  --dataset prepared --prepared_path "$BASE/prep/eval_dp.npz" \
  --kp_index_mode uniform --dphi_ckpt "$BASE/dphi" \
  --stage1_best_of 16 --stage1_best_of_mode dp --stage1_cache_interval 2 \
  --s2_noise_mode none --soft_anchor_clamp 1 \
  --pos_clip 1 --compare_oracle 1 --num_batches 8 --batch 64 \
  --sanity 1 --out_dir "$BASE/samples_bestof16_boot16_softclamp"

# A/B 3: the ORIGINAL Stage-2 under the same winning sampling config —
# completes the {il, il_boot16} x {level-noise, softclamp} grid
$RUNNER interpolated_diffusion_tpu.sample.generate \
  --kp_ckpt "$BASE/kp" --interp_ckpt "$BASE/il" \
  --dataset prepared --prepared_path "$BASE/prep/eval_dp.npz" \
  --kp_index_mode uniform --dphi_ckpt "$BASE/dphi" \
  --stage1_best_of 16 --stage1_best_of_mode dp --stage1_cache_interval 2 \
  --s2_noise_mode none --soft_anchor_clamp 1 \
  --pos_clip 1 --compare_oracle 1 --num_batches 8 --batch 64 \
  --sanity 1 --out_dir "$BASE/samples_bestof16_softclamp"

python scripts/log_experiment.py --title "d4rl stage2 boot16 under dp best-of-16" \
  --run_dir "$BASE/il_boot16" --results "$BASE/samples_bestof16_boot16/summary.json"
