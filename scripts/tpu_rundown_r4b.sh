#!/usr/bin/env bash
# Round-4 injection queue: the boot16 A/B cells that run AFTER the 4h
# Stage-2 retrain inside d4rl_il_boot16's single timeout window (the train
# alone fills it, so run_d4rl_stage2_boot16.sh's sampling tail gets killed
# — ADVICE r3's "stage the pipeline" point, realized). Run this when the
# main rundown is between steps; every step is marker-gated and
# prerequisite-gated, so it is safe to re-run. Shares runs/tpu_rundown_r4
# markers with the main queue.
set -u
cd "$(dirname "$0")/.."
LOG=runs/tpu_rundown_r4
mkdir -p "$LOG"

run_step() {
  local name=$1 tmo=$2; shift 2
  if [ -f "$LOG/$name.done" ]; then echo "== $name: already done"; return 0; fi
  echo "== $name: start $(date)"
  if timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1; then
    touch "$LOG/$name.done"; echo "== $name: OK $(date)"; return 0
  else
    local rc=$?
    echo "== $name: FAILED rc=$rc (see $LOG/$name.log)"; return "$rc"
  fi
}

need() {
  local p; for p in "$@"; do
    [ -e "$p" ] || { echo "== SKIP (missing prerequisite: $p)"; return 1; }
  done
}

B=runs/d4rl_r4
SAMPLE_COMMON="--dataset prepared --prepared_path $B/prep/eval_dp.npz \
  --kp_index_mode uniform --dphi_ckpt $B/dphi \
  --pos_clip 1 --compare_oracle 1 --num_batches 8 --batch 64 --sanity 1"
BO16="--stage1_best_of 16 --stage1_best_of_mode dp --stage1_cache_interval 2"

claim() {  # claim <name> <existing_output> -> 0 iff the cell still needs to run
  # the main rundown's boot16 pipeline may have produced the same sample
  # dir before its timeout; mark done instead of redoing ~15 min of chip
  local name=$1 out=$2
  if [ ! -f "$LOG/$name.done" ] && [ -f "$out" ]; then
    echo "== $name: output already exists ($out), marking done"
    touch "$LOG/$name.done"
  fi
  return 0
}

if need $B/il_boot16/ckpt_10000; then
  claim r4b_bestof16_boot16 $B/samples_bestof16_boot16/summary.json
  claim r4b_bestof16_boot16_softclamp $B/samples_bestof16_boot16_softclamp/summary.json
  claim r4b_bestof16_softclamp $B/samples_bestof16_softclamp/summary.json
  # cell: il_boot16 under the r3 headline sampler (bestof16 + level noise)
  run_step r4b_bestof16_boot16 3600 python -m \
    interpolated_diffusion_tpu.sample.generate \
    --kp_ckpt $B/kp --interp_ckpt $B/il_boot16 $SAMPLE_COMMON $BO16 \
    --s2_noise_mode level --s2_noise_sigma 0.003 \
    --out_dir $B/samples_bestof16_boot16
  # cell: il_boot16 under the ablation-winning config (no noise + softclamp)
  run_step r4b_bestof16_boot16_softclamp 3600 python -m \
    interpolated_diffusion_tpu.sample.generate \
    --kp_ckpt $B/kp --interp_ckpt $B/il_boot16 $SAMPLE_COMMON $BO16 \
    --s2_noise_mode none --soft_anchor_clamp 1 \
    --out_dir $B/samples_bestof16_boot16_softclamp
  # cell: ORIGINAL il under the same winning config (completes the grid)
  run_step r4b_bestof16_softclamp 3600 python -m \
    interpolated_diffusion_tpu.sample.generate \
    --kp_ckpt $B/kp --interp_ckpt $B/il $SAMPLE_COMMON $BO16 \
    --s2_noise_mode none --soft_anchor_clamp 1 \
    --out_dir $B/samples_bestof16_softclamp
  if need $B/samples_bestof16_boot16/summary.json; then
    python scripts/log_experiment.py \
      --title "d4rl stage2 boot16 under dp best-of-16 (r4b)" \
      --run_dir $B/il_boot16 \
      --results $B/samples_bestof16_boot16/summary.json || true
  fi
fi

# clean component profile for the small-L attention close-out note
# (needs an idle chip — run only from this injection window)
run_step profile_smallL_r4 1800 python scripts/profile_pipeline.py

echo "rundown r4b complete $(date)"
