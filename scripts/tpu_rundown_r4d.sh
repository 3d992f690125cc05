#!/usr/bin/env bash
# Round-4 session-C addendum: runs AFTER scripts/tpu_rundown_r4c.sh drains.
# Completes the boot16 A/B grid (cell F: original il under the best-of-
# everything sampler, so the summarizer's {il, il_boot16} x {sampler} table
# has no holes) and takes the idle-chip component profile that decides the
# small-L attention close-out (VERDICT-r3 #6). Shares runs/tpu_rundown_r4
# markers; safe to re-run.
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

# cell F: il + dp best-of-16 + softclamp (the summarizer's remaining cell)
if need $B/kp $B/il $B/dphi; then
  run_step r4b_bestof16_softclamp 1800 python -m \
    interpolated_diffusion_tpu.sample.generate \
    --kp_ckpt $B/kp --interp_ckpt $B/il \
    --dataset prepared --prepared_path $B/prep/eval_dp.npz \
    --kp_index_mode uniform --dphi_ckpt $B/dphi \
    --pos_clip 1 --compare_oracle 1 --num_batches 8 --batch 64 --sanity 1 \
    --stage1_best_of 16 --stage1_best_of_mode dp --stage1_cache_interval 2 \
    --s2_noise_mode none --soft_anchor_clamp 1 \
    --out_dir $B/samples_bestof16_softclamp
fi

# idle-chip component profile (kp/il denoiser ms/iter per policy + the
# projections-only skeleton -> attention share at K=8 and T=64)
run_step profile_r4 2400 python scripts/profile_pipeline.py

echo "rundown r4d complete $(date)"
