#!/usr/bin/env bash
# Per-env D4RL dist-corruption experiment (parity with reference
# scripts/run_d4rl_dist_experiment.sh): for each maze2d env independently —
# no unified merge — train Stage-1 keypoints and a dist-corrupted Stage-2,
# then sample on both the train and eval splits. Episode synthesis is the
# gym-free PD point-mass route (data/maze2d_synth.py); drop in real
# gym-exported ep_*.npz (data/d4rl_live.py) when the mujoco stack exists.
# Override any VAR=... on the command line; STEPS=50 for a smoke run.
# RUNNER="python scripts/cpu_run.py" runs every stage on the CPU backend.
set -euo pipefail
cd "$(dirname "$0")/../.."
RUNNER=${RUNNER:-python -m}

T=${T:-128}; K=${K:-8}; LEVELS=${LEVELS:-3}; K_SCHEDULE=${K_SCHEDULE:-doubling}
STEPS=${STEPS:-20000}; S2_STEPS=${S2_STEPS:-${STEPS}}; BATCH=${BATCH:-256}
N_EPISODES=${N_EPISODES:-400}
N_PER_ENV=${N_PER_ENV:-6000}
N_EVAL_PER_ENV=${N_EVAL_PER_ENV:-600}
OUT=${OUT:-runs/d4rl_dist}
ENVS=${ENVS:-"maze2d-umaze-v1 maze2d-medium-v1 maze2d-large-v1"}
SAMPLE_BATCHES=${SAMPLE_BATCHES:-4}
SIGMA_MAX=${SIGMA_MAX:-0.1}

mkdir -p "$OUT/prep"

for ENV in $ENVS; do
  tag=${ENV//maze2d-/}; tag=${tag//-v1/}
  echo "==> [$ENV] prep"
  if [ ! -f "$OUT/prep/ep_${tag}.npz" ]; then
    $RUNNER interpolated_diffusion_tpu.data.maze2d_synth \
      --env_id "$ENV" --n_episodes "$N_EPISODES" --max_steps 900 \
      --seed 0 --out_path "$OUT/prep/ep_${tag}.npz"
  fi
  for split in train eval; do
    n=$N_PER_ENV; seed=0
    [ "$split" = eval ] && { n=$N_EVAL_PER_ENV; seed=777777; }
    if [ ! -f "$OUT/prep/${split}_${tag}.npz" ]; then
      $RUNNER interpolated_diffusion_tpu.data.d4rl \
        --episodes "$OUT/prep/ep_${tag}.npz" --env_id "$ENV" \
        --out_path "$OUT/prep/${split}_${tag}.npz" \
        --T "$T" --num_samples "$n" --window_mode random \
        --with_velocity 1 --max_collision_rate 0.0 --min_goal_dist 0.15 \
        --use_sdf 1 --seed $seed
    fi
  done

  GRID_H=$(python -c "import numpy as np; print(np.load('$OUT/prep/train_${tag}.npz')['occ'].shape[-2])")
  GRID_W=$(python -c "import numpy as np; print(np.load('$OUT/prep/train_${tag}.npz')['occ'].shape[-1])")
  COMMON="--dataset prepared --T $T --use_sdf 1 --maze_h $GRID_H --maze_w $GRID_W"

  echo "==> [$ENV] Stage 1 keypoints"
  $RUNNER interpolated_diffusion_tpu.train.train_keypoints \
    $COMMON --prepared_path "$OUT/prep/train_${tag}.npz" \
    --K "$K" --steps "$STEPS" --batch "$BATCH" \
    --out_dir "$OUT/${tag}/kp"

  echo "==> [$ENV] Stage 2 interp (dist corruption)"
  $RUNNER interpolated_diffusion_tpu.train.train_interp_levels \
    $COMMON --prepared_path "$OUT/prep/train_${tag}.npz" \
    --K_min "$K" --levels "$LEVELS" --k_schedule "$K_SCHEDULE" --mode adj \
    --corrupt_mode dist --corrupt_sigma_max "$SIGMA_MAX" \
    --steps "$S2_STEPS" --batch "$BATCH" --out_dir "$OUT/${tag}/il"

  for split in train eval; do
    echo "==> [$ENV] sample $split"
    $RUNNER interpolated_diffusion_tpu.sample.generate \
      --kp_ckpt "$OUT/${tag}/kp" --interp_ckpt "$OUT/${tag}/il" \
      --dataset prepared --prepared_path "$OUT/prep/${split}_${tag}.npz" \
      --kp_index_mode uniform --pos_clip 1 \
      --num_batches "$SAMPLE_BATCHES" --batch 32 \
      --out_dir "$OUT/${tag}/samples_${split}"
  done
  echo "==> [$ENV] done"
done

python scripts/log_experiment.py --title "d4rl per-env dist T=$T" \
  --run_dir "$OUT" \
  --results "$OUT/$(echo $ENVS | awk '{print $1}' | sed 's/maze2d-//;s/-v1//')/samples_eval/summary.json" || true
echo "d4rl per-env dist pipeline OK"
