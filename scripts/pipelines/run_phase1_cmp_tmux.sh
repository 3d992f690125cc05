#!/usr/bin/env bash
# Phase-1 input-mode comparison (parity with the reference's
# scripts/run_phase1_cmp_tmux.sh): launch one training run per
# phase1_input_mode in a tmux session (one window each) so their telemetry
# can be compared live; or run sequentially with TMUX_MODE=0, the default
# (single-chip TPU — two Wan trainings cannot share one chip's HBM anyway,
# so TMUX_MODE=1 is only for CPU smoke or multi-host setups).
set -euo pipefail
cd "$(dirname "$0")/../.."
RUNNER=${RUNNER:-python -m}

SESSION=${SESSION:-phase1_cmp}
MODES=${MODES:-"short_anchors short_midpoints short_meanpool"}
STEPS=${STEPS:-2000}; BATCH=${BATCH:-1}; GRAD_ACCUM=${GRAD_ACCUM:-4}
K=${K:-5}; T=${T:-21}
ATTN=${ATTN:-sla}; TOPK=${TOPK:-0.1}; LORA_RANK=${LORA_RANK:-8}
OUT=${OUT:-runs/phase1_cmp}
USE_TMUX=${TMUX_MODE:-0}

CMD_COMMON="$RUNNER interpolated_diffusion_tpu.train.train_keypoints_wansynth \
  --data synthetic --num_samples ${NUM_SAMPLES:-1000} --T $T --K $K \
  --use_wan 1 --attn_mode $ATTN --sla_topk $TOPK --lora_rank $LORA_RANK \
  --use_remat 1 --layer_mode scan --frame_cond 1 \
  --batch $BATCH --grad_accum $GRAD_ACCUM --steps $STEPS"

mkdir -p "$OUT"
if [ "$USE_TMUX" = 1 ]; then
  tmux new-session -d -s "$SESSION" || true
  for MODE in $MODES; do
    tmux new-window -t "$SESSION" -n "$MODE" \
      "$CMD_COMMON --phase1_input_mode $MODE --out_dir $OUT/$MODE 2>&1 \
       | tee $OUT/$MODE.log"
  done
  echo "launched in tmux session $SESSION (attach: tmux attach -t $SESSION)"
else
  for MODE in $MODES; do
    echo "=== phase1_input_mode=$MODE"
    $CMD_COMMON --phase1_input_mode "$MODE" --out_dir "$OUT/$MODE" 2>&1 \
      | tee "$OUT/$MODE.log"
  done
  # compare final losses across modes from the tee'd trainer logs
  # ("step N loss X | ..." lines)
  python - "$OUT" <<'EOF'
import pathlib, re, sys
out = pathlib.Path(sys.argv[1])
for f in sorted(out.glob("*.log")):
    losses = [float(m.group(1))
              for m in re.finditer(r"step \d+ loss ([0-9.eE+-]+)", f.read_text())]
    if losses:
        tail = losses[-min(10, len(losses)):]
        print(f"{f.stem:20s} final-{len(tail)} loss "
              f"{sum(tail) / len(tail):.5f}")
EOF
fi
