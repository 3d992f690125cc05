#!/usr/bin/env bash
# idxmix at the HEADLINE budget: the 8k arms cluster (~0.19-0.20 interp;
# undertrained Stage-1 compresses policy differences). Stage-1 trains at
# ~8300 samples/s, so 20k-step arms cost ~10 min each — redo the four
# non-selector-placement arms at the unified pipeline's 20k so the table
# is budget-matched to the 0.0665 headline (reference surface:
# train_keypoints.py:423-503).
set -u
cd "$(dirname "$0")/.."
LOG=runs/tpu_rundown_r5
mkdir -p "$LOG"
. scripts/rundown_lib.sh
B=runs/d4rl_r4
if need $B/il $B/selector $B/dphi; then
  for MIX in "dp:1.0" "uniform:1.0" \
             "selector:0.7,uniform:0.2,random:0.1" \
             "dp:0.7,uniform:0.2,random:0.1"; do
    tag=$(echo "$MIX" | tr ':,.' '___')
    run_step "idxmix20k_${tag}" 4200 env BASE=$B STEPS=20000 OUT_PREFIX=ablate20k_kp_ \
      MIXES="$MIX" bash scripts/pipelines/run_stage1_idxmix_ablation.sh
  done
fi
echo "rundown r5h done $(date -Is)"
