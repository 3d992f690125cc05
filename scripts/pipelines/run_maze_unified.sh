#!/usr/bin/env bash
# End-to-end maze pipeline: DP prep -> D_phi -> selector -> Stage-1 -> Stage-2
# (bootstrapped) -> e2e sampling with oracle comparison.
# Parity with reference scripts/run_d4rl_unified_dp_train_sample.sh (env-var
# configured; override any VAR=... on the command line).
set -euo pipefail
cd "$(dirname "$0")/../.."

T=${T:-64}; K=${K:-8}; LEVELS=${LEVELS:-3}
STEPS=${STEPS:-20000}; BATCH=${BATCH:-256}
NUM_SAMPLES=${NUM_SAMPLES:-100000}
OUT=${OUT:-runs/maze_unified}
PREP=${PREP:-$OUT/prep/dp.npz}

python -m interpolated_diffusion_tpu.data.prepare_dp_keypoints \
  --out_path "$PREP" --T $T --K $K --num_samples ${PREP_SAMPLES:-20000} \
  --store_kp_mask_levels 1 --levels $LEVELS

python -m interpolated_diffusion_tpu.train.train_segment_cost \
  --dataset prepared --prepared_path "$PREP" --T $T \
  --steps ${DPHI_STEPS:-5000} --batch $BATCH --out_dir "$OUT/dphi"

python -m interpolated_diffusion_tpu.train.train_keypoint_selector \
  --dataset prepared --prepared_path "$PREP" --T $T --K $K \
  --levels $LEVELS --use_level 1 \
  --steps ${SEL_STEPS:-5000} --batch $BATCH --out_dir "$OUT/selector"

python -m interpolated_diffusion_tpu.train.train_keypoints \
  --dataset prepared --prepared_path "$PREP" --T $T --K $K \
  --idx_policy "dp:0.5,uniform:0.3,random:0.2" \
  --steps $STEPS --batch $BATCH --out_dir "$OUT/kp"

python -m interpolated_diffusion_tpu.train.train_interp_levels \
  --dataset prepared --prepared_path "$PREP" --T $T --K_min $K --levels $LEVELS \
  --mode adj --anchor_conf 1 --anchor_conf_anneal 1 \
  --corrupt_mode dist --corrupt_sigma_max 0.05 \
  --bootstrap_ckpt "$OUT/kp" \
  --steps $STEPS --batch $BATCH --out_dir "$OUT/il"

python -m interpolated_diffusion_tpu.sample.generate \
  --kp_ckpt "$OUT/kp" --interp_ckpt "$OUT/il" \
  --dataset prepared --prepared_path "$PREP" \
  --num_batches ${SAMPLE_BATCHES:-8} --batch 64 --compare_oracle 1 --sanity 1 \
  --out_dir "$OUT/samples"

python scripts/log_experiment.py --title "maze unified pipeline" \
  --run_dir "$OUT/il" --results "$OUT/samples/summary.json"
