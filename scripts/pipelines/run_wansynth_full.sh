#!/usr/bin/env bash
# Full wansynth pipeline at production settings (parity with the reference's
# scripts/run_wansynth_pipeline_full.sh): Phase-1 Wan keypoint fine-tune (SLA
# + LoRA + frame-cond) -> Phase-1 anchor precompute -> Phase-2 token interp
# fine-tune on those anchors -> flow interpolator -> interpolator eval.
#
# Defaults use the synthetic latent generator (no dataset download in this
# environment); point DATA=tar DATA_ROOT=... at real wan-synth shards to train
# on them. One v5e chip: batch 1, grad_accum for the effective batch.
set -euo pipefail
cd "$(dirname "$0")/../.."
RUNNER=${RUNNER:-python -m}

OUT=${OUT:-runs/wansynth_full}
STEPS=${STEPS:-2000}
BATCH=${BATCH:-1}; GRAD_ACCUM=${GRAD_ACCUM:-4}
K=${K:-5}; T=${T:-21}; LEVELS=${LEVELS:-2}
ATTN=${ATTN:-sla}; TOPK=${TOPK:-0.1}; LORA_RANK=${LORA_RANK:-8}
P1_MODE=${P1_MODE:-short_anchors}
DATA=${DATA:-synthetic}; DATA_ROOT=${DATA_ROOT:-}
NUM_SAMPLES=${NUM_SAMPLES:-1000}
# Anchor/teacher key-joins are defined over tar shards, so synthetic data is
# materialized into tars once and every stage runs in tar mode.
if [ "$DATA" = synthetic ]; then
  DATA_ROOT="$OUT/data"
  if [ ! -d "$DATA_ROOT" ] || [ -z "$(ls -A "$DATA_ROOT" 2>/dev/null)" ]; then
    $RUNNER interpolated_diffusion_tpu.data.make_synth_tars \
      --out_root "$DATA_ROOT" --num_samples "$NUM_SAMPLES" --T "${T:-21}" ${EXTRA_DATA_ARGS:-}
  fi
fi
DATA_ARGS="--data tar --data_root $DATA_ROOT --num_samples $NUM_SAMPLES ${EXTRA_DATA_ARGS:-}"
WAN_ARGS="--use_wan 1 --attn_mode $ATTN --sla_topk $TOPK --lora_rank $LORA_RANK ${EXTRA_WAN_ARGS:-} \
  --use_remat 1 --layer_mode scan --bf16 1"
[ -n "${WAN_PRETRAINED:-}" ] && WAN_ARGS="$WAN_ARGS --wan_pretrained $WAN_PRETRAINED"

# Phase 1: Wan as keypoint denoiser (anchor-slot eps prediction)
$RUNNER interpolated_diffusion_tpu.train.train_keypoints_wansynth \
  $DATA_ARGS $WAN_ARGS --T "$T" --K "$K" \
  --phase1_input_mode "$P1_MODE" --frame_cond 1 --cond_drop_prob 0.1 \
  --batch "$BATCH" --grad_accum "$GRAD_ACCUM" --steps "$STEPS" \
  --save_every "${SAVE_EVERY:-500}" --out_dir "$OUT/p1"

# Anchor precompute: DDIM-sample Phase-1 anchors into shards keyed by sample
$RUNNER interpolated_diffusion_tpu.data.precompute_phase1_anchors \
  --ckpt "$OUT/p1/ckpt_$STEPS" --out_root "$OUT/anchors" \
  --data tar --data_root "$DATA_ROOT" --batch "$BATCH" \
  --ddim_steps "${ANCHOR_DDIM:-4}" --cache_interval "${ANCHOR_CACHE:-1}"

# Phase 2: token interp-level fine-tune joined with the Phase-1 anchors
$RUNNER interpolated_diffusion_tpu.train.train_interp_levels_wansynth \
  $DATA_ARGS $WAN_ARGS --T "$T" --K_min "$K" --levels "$LEVELS" --mode adj \
  --anchors_root "$OUT/anchors" \
  --batch "$BATCH" --grad_accum "$GRAD_ACCUM" --steps "$STEPS" \
  --save_every "${SAVE_EVERY:-500}" --out_dir "$OUT/p2"

# Learned latent interpolator + eval vs LERP (reference logs the same pair)
$RUNNER interpolated_diffusion_tpu.train.train_flow_interpolator_wansynth \
  $DATA_ARGS --T "$T" --batch "${FLOW_BATCH:-8}" --steps "${FLOW_STEPS:-$STEPS}" \
  --out_dir "$OUT/flow"
$RUNNER interpolated_diffusion_tpu.diagnostics.eval_interpolators \
  --interpolator flow --ckpt "$OUT/flow/ckpt_${FLOW_STEPS:-$STEPS}" \
  --data tar --data_root "$DATA_ROOT" \
  --T "$T" --K "$K" --batch 4 --num_batches "${EVAL_BATCHES:-8}"

echo "wansynth full pipeline complete under $OUT"
