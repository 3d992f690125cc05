#!/usr/bin/env bash
# Retrain Stage-2 under one named recipe and re-sample with the existing
# Stage-1/selector checkpoints. Parity with the reference's stage-2 ablation
# family (scripts/run_stage2_smallnoise_10k_and_sample.sh,
# run_stage2_nocorrupt_10k_and_sample.sh,
# run_stage2_selector_retrain_and_sample.sh) folded into one script:
#
#   VARIANT=smallnoise   small dist-noise corruption (the reference's winner)
#   VARIANT=nocorrupt    corrupt_mode=none (match-inference ablation)
#   VARIANT=selector     selector-driven nested masks
#
# Assumes a finished scripts/pipelines/run_d4rl_unified.sh (or any run with
# the same layout) at BASE. RUNNER="python scripts/cpu_run.py" for CPU.
set -euo pipefail
cd "$(dirname "$0")/../.."
RUNNER=${RUNNER:-python -m}

VARIANT=${VARIANT:-smallnoise}
BASE=${BASE:-runs/d4rl_unified}
T=${T:-128}; K=${K:-8}; LEVELS=${LEVELS:-8}; K_SCHEDULE=${K_SCHEDULE:-geom}
STEPS=${STEPS:-10000}; BATCH=${BATCH:-256}
TRAIN_DATA=${TRAIN_DATA:-$BASE/prep/train_dp.npz}
EVAL_DATA=${EVAL_DATA:-$BASE/prep/eval_dp.npz}
KP_CKPT=${KP_CKPT:-$BASE/kp}
SELECTOR_CKPT=${SELECTOR_CKPT:-$BASE/selector}
OUT=${OUT:-$BASE/il_${VARIANT}}
GRID_H=$(python -c "import numpy as np; print(np.load('$TRAIN_DATA')['occ'].shape[2])")
GRID_W=$(python -c "import numpy as np; print(np.load('$TRAIN_DATA')['occ'].shape[3])")
COMMON="--dataset prepared --T $T --use_sdf 1 --maze_h $GRID_H --maze_w $GRID_W"

case "$VARIANT" in
  smallnoise)
    RECIPE="--mask_policy uniform --corrupt_mode dist \
      --corrupt_sigma_max ${SIGMA_MAX:-0.02} --corrupt_sigma_min ${SIGMA_MIN:-0.003} \
      --corrupt_sigma_pow 0.75 --corrupt_anchor_frac 0.25"
    SAMPLE_EXTRA="--s2_noise_mode level --s2_noise_sigma ${SIGMA_MIN:-0.003}" ;;
  nocorrupt)
    RECIPE="--mask_policy uniform --corrupt_mode none"
    SAMPLE_EXTRA="--s2_noise_mode none" ;;
  selector)
    RECIPE="--mask_policy selector --selector_ckpt $SELECTOR_CKPT \
      --corrupt_mode dist --corrupt_sigma_max ${SIGMA_MAX:-0.02} \
      --corrupt_sigma_min ${SIGMA_MIN:-0.003} --corrupt_sigma_pow 0.75 \
      --corrupt_anchor_frac 0.25"
    SAMPLE_EXTRA="--stage2_mask_policy selector --s2_noise_mode level \
      --s2_noise_sigma ${SIGMA_MIN:-0.003}" ;;
  *) echo "unknown VARIANT=$VARIANT (smallnoise|nocorrupt|selector)"; exit 2 ;;
esac

# the Stage-1 ckpt may carry D_phi kp_feat cost channels (kp_feat_dphi);
# thread the predictor into the bootstrap sampler and the e2e sampler.
DPHI_ARGS=""
[ -d "${DPHI_CKPT:-$BASE/dphi}" ] && DPHI_ARGS="--dphi_ckpt ${DPHI_CKPT:-$BASE/dphi}"
MIX_ARGS=""
[ -n "${MASK_POLICY_MIX:-}" ] && MIX_ARGS="--mask_policy_mix $MASK_POLICY_MIX"

$RUNNER interpolated_diffusion_tpu.train.train_interp_levels \
  $COMMON --prepared_path "$TRAIN_DATA" \
  --K_min "$K" --levels "$LEVELS" --k_schedule "$K_SCHEDULE" --mode adj \
  --anchor_conf 1 --anchor_conf_anneal 1 --pos_clip 1 \
  $RECIPE $MIX_ARGS \
  --bootstrap_ckpt "$KP_CKPT" $DPHI_ARGS --bootstrap_ddim_steps 20 \
  --bootstrap_warmup_steps $(( STEPS / 4 )) \
  --steps "$STEPS" --batch "$BATCH" --out_dir "$OUT"

$RUNNER interpolated_diffusion_tpu.sample.generate \
  --kp_ckpt "$KP_CKPT" --interp_ckpt "$OUT" \
  --dataset prepared --prepared_path "$EVAL_DATA" \
  --kp_index_mode "${KP_INDEX_MODE:-uniform}" --selector_ckpt "$SELECTOR_CKPT" \
  $SAMPLE_EXTRA $DPHI_ARGS --pos_clip 1 --compare_oracle 1 \
  --num_batches "${SAMPLE_BATCHES:-8}" --batch 64 \
  --out_dir "$OUT/samples"

python scripts/log_experiment.py --title "stage2 $VARIANT T=$T" \
  --run_dir "$OUT" --results "$OUT/samples/summary.json"
