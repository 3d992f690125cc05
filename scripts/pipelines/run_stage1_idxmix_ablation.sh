#!/usr/bin/env bash
# Stage-1 anchor-quality ablation: train the keypoint denoiser under several
# idx-policy mixes (reference train_keypoints.py:423-503 semantics) and sample
# each against the SAME Stage-2 checkpoint, reporting interp/refined/oracle
# metrics per mix. This is the experiment that localizes the Stage-1
# anchor-error gap (oracle vs predicted anchors) and finds which mix closes it.
#
# Assumes a finished run_d4rl_unified.sh layout at BASE (prep, selector, il).
# RUNNER="python scripts/cpu_run.py" for CPU. MIXES is a |-separated list.
set -euo pipefail
cd "$(dirname "$0")/../.."
RUNNER=${RUNNER:-python -m}

BASE=${BASE:-runs/d4rl_unified}
T=${T:-128}; K=${K:-8}
STEPS=${STEPS:-20000}; BATCH=${BATCH:-256}
TRAIN_DATA=${TRAIN_DATA:-$BASE/prep/train_dp.npz}
EVAL_DATA=${EVAL_DATA:-$BASE/prep/eval_dp.npz}
SELECTOR_CKPT=${SELECTOR_CKPT:-$BASE/selector}
IL_CKPT=${IL_CKPT:-$BASE/il}
MIXES=${MIXES:-"dp:1.0|uniform:1.0|selector:1.0|selector:0.7,uniform:0.2,random:0.1|dp:0.7,uniform:0.2,random:0.1"}
GRID_H=$(python -c "import numpy as np; print(np.load('$TRAIN_DATA')['occ'].shape[2])")
GRID_W=$(python -c "import numpy as np; print(np.load('$TRAIN_DATA')['occ'].shape[3])")
COMMON="--dataset prepared --T $T --use_sdf 1 --maze_h $GRID_H --maze_w $GRID_W"

IFS='|' read -ra MIX_ARR <<< "$MIXES"
for MIX in "${MIX_ARR[@]}"; do
  tag=$(echo "$MIX" | tr ':,.' '___')
  OUT="$BASE/${OUT_PREFIX:-ablate_kp_}${tag}"
  SEL_ARGS=""
  case "$MIX" in *selector*) SEL_ARGS="--selector_ckpt $SELECTOR_CKPT" ;; esac
  $RUNNER interpolated_diffusion_tpu.train.train_keypoints \
    $COMMON --prepared_path "$TRAIN_DATA" \
    --schedule cosine --N_train 1000 --K "$K" \
    --idx_policy "$MIX" $SEL_ARGS \
    --use_kp_feat 1 --kp_feat_dim "${KP_FEAT_DIM:-5}" --dphi_ckpt "$BASE/dphi" \
    --steps "$STEPS" --batch "$BATCH" --out_dir "$OUT"

  # sample with matching inference-time index mode (selector when trained
  # with selector anchors, uniform otherwise — the reference's pairing)
  KP_MODE=uniform
  case "$MIX" in selector:1.0) KP_MODE=selector ;; esac
  $RUNNER interpolated_diffusion_tpu.sample.generate \
    --kp_ckpt "$OUT" --interp_ckpt "$IL_CKPT" \
    --dataset prepared --prepared_path "$EVAL_DATA" \
    --kp_index_mode "${KP_INDEX_MODE:-$KP_MODE}" --selector_ckpt "$SELECTOR_CKPT" \
    --dphi_ckpt "$BASE/dphi" \
    --s2_noise_mode level --s2_noise_sigma "${SIGMA_MIN:-0.003}" \
    --pos_clip 1 --compare_oracle 1 \
    --num_batches "${SAMPLE_BATCHES:-8}" --batch 64 \
    --out_dir "$OUT/samples"
  python scripts/log_experiment.py --title "stage1 idxmix $MIX" \
    --run_dir "$OUT" --results "$OUT/samples/summary.json"
done

python - "$BASE" <<'EOF'
import json, pathlib, sys
base = pathlib.Path(sys.argv[1])
rows = []
import os
prefix = os.environ.get("OUT_PREFIX", "ablate_kp_")
for d in sorted(base.glob(prefix + "*/samples/summary.json")):
    s = json.loads(d.read_text())
    rows.append((d.parent.parent.name, s))
print(f"{'mix':44s} {'interp':>8s} {'refined':>8s} {'oracle_ref':>10s} {'succ':>6s}")
for name, s in rows:
    print(f"{name:44s} {s.get('interp_collision_rate', float('nan')):8.4f} "
          f"{s.get('refined_collision_rate', float('nan')):8.4f} "
          f"{s.get('oracle_refined_collision_rate', float('nan')):10.4f} "
          f"{s.get('refined_success', float('nan')):6.3f}")
EOF
