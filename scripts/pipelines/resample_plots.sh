#!/usr/bin/env bash
# Re-sample existing checkpoints with full visualization output (parity with
# reference scripts/resample_unified_dp.sh / resample_d4rl_plots.sh): per-
# sample PNG panels, per-step diffusion frames, GIF, samples.npz — without
# retraining anything. Points at a finished run_d4rl_unified.sh layout.
set -euo pipefail
cd "$(dirname "$0")/../.."
RUNNER=${RUNNER:-python -m}

BASE=${BASE:-runs/d4rl_unified}
EVAL_DATA=${EVAL_DATA:-$BASE/prep/eval_dp.npz}
OUT=${OUT:-$BASE/resample_plots}

$RUNNER interpolated_diffusion_tpu.sample.generate \
  --kp_ckpt "${KP_CKPT:-$BASE/kp}" --interp_ckpt "${IL_CKPT:-$BASE/il}" \
  --dataset prepared --prepared_path "$EVAL_DATA" \
  --kp_index_mode "${KP_INDEX_MODE:-uniform}" \
  --selector_ckpt "${SELECTOR_CKPT:-$BASE/selector}" \
  --s2_noise_mode level --s2_noise_sigma "${SIGMA_MIN:-0.003}" \
  --pos_clip 1 --compare_oracle 1 \
  --save_plots 1 --save_steps 1 \
  --num_batches "${SAMPLE_BATCHES:-2}" --batch "${BATCH:-16}" \
  --out_dir "$OUT"

# optional: re-render any samples.npz into PNGs (host-side, no model)
python scripts/rerender_npz.py --npz "$OUT/samples.npz" \
  --out "$OUT/rerender" -n "${RERENDER_N:-16}" || true
