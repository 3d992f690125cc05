#!/usr/bin/env bash
# D4RL T=128 unified pipeline at the reference's winning configuration
# (reference scripts/run_d4rl_unified_dp_train_sample.sh +
# run_stage2_smallnoise_10k_and_sample.sh): maze2d episode synthesis (gym-free)
# -> per-env windowed prep -> pad-unified merge -> DP annotation -> D_phi ->
# selector -> Stage-1 (selector/uniform/random idx mix) -> Stage-2 small
# dist-noise -> e2e sampling with oracle comparison.
# Override any VAR=... on the command line; STEPS=50 for a smoke run.
# RUNNER="python scripts/cpu_run.py" runs every stage on the CPU backend.
set -euo pipefail
cd "$(dirname "$0")/../.."
RUNNER=${RUNNER:-python -m}

T=${T:-128}; K=${K:-8}; LEVELS=${LEVELS:-8}; K_SCHEDULE=${K_SCHEDULE:-geom}
STEPS=${STEPS:-20000}; S2_STEPS=${S2_STEPS:-${STEPS}}; BATCH=${BATCH:-256}
DPHI_STEPS=${DPHI_STEPS:-$(( STEPS / 2 ))}
SEL_STEPS=${SEL_STEPS:-$(( STEPS / 2 ))}
N_EPISODES=${N_EPISODES:-400}
N_PER_ENV=${N_PER_ENV:-6000}
N_EVAL_PER_ENV=${N_EVAL_PER_ENV:-600}
OUT=${OUT:-runs/d4rl_unified}
ENVS=${ENVS:-"maze2d-umaze-v1 maze2d-medium-v1 maze2d-large-v1"}
SAMPLE_BATCHES=${SAMPLE_BATCHES:-8}

mkdir -p "$OUT/prep"

# 1) synthesize maze2d episodes per env (PD point-mass along A* routes)
train_inputs=(); eval_inputs=()
for ENV in $ENVS; do
  tag=${ENV//maze2d-/}; tag=${tag//-v1/}
  if [ ! -f "$OUT/prep/ep_${tag}.npz" ]; then
    $RUNNER interpolated_diffusion_tpu.data.maze2d_synth \
      --env_id "$ENV" --n_episodes "$N_EPISODES" --max_steps 900 \
      --seed 0 --out_path "$OUT/prep/ep_${tag}.npz"
  fi
  # 2) window + normalize + reject (collision-free windows). D=2 positions
  # only: the reference's winning config never sets --with_velocity (its
  # prepare_d4rl_dataset.py default is 0) and its per-step pos_clip then
  # bounds EVERY data dim through the DDIM loop — the round-2 D=4 run left
  # velocity dims unclipped and the cosine-1000 terminal step blew them up.
  for split in train eval; do
    n=$N_PER_ENV; seed=0
    [ "$split" = eval ] && { n=$N_EVAL_PER_ENV; seed=777777; }
    if [ ! -f "$OUT/prep/${split}_${tag}.npz" ]; then
      $RUNNER interpolated_diffusion_tpu.data.d4rl \
        --episodes "$OUT/prep/ep_${tag}.npz" --env_id "$ENV" \
        --out_path "$OUT/prep/${split}_${tag}.npz" \
        --T "$T" --num_samples "$n" --window_mode random \
        --with_velocity "${WITH_VELOCITY:-0}" \
        --max_collision_rate 0.0 --min_goal_dist 0.15 \
        --seed $seed
    fi
  done
  train_inputs+=("$OUT/prep/train_${tag}.npz")
  eval_inputs+=("$OUT/prep/eval_${tag}.npz")
done

# 3) pad-unify the envs onto one grid (per-sample occ + sdf)
for split in train eval; do
  [ "$split" = train ] && inputs=("${train_inputs[@]}") || inputs=("${eval_inputs[@]}")
  if [ ! -f "$OUT/prep/${split}.npz" ]; then
    $RUNNER interpolated_diffusion_tpu.data.d4rl unified \
      --inputs ${inputs[*]} \
      --out_path "$OUT/prep/${split}.npz" --use_sdf 1
  fi
done

# 4) DP keypoint annotation (GT costs) for train+eval; levels for selector
for split in train eval; do
  if [ ! -f "$OUT/prep/${split}_dp.npz" ]; then
    $RUNNER interpolated_diffusion_tpu.data.prepare_dp_keypoints \
      --prepared_path "$OUT/prep/${split}.npz" \
      --out_path "$OUT/prep/${split}_dp.npz" \
      --T "$T" --K "$K" --batch 128 --use_sdf 1 \
      --store_kp_mask_levels 1 --levels "$LEVELS" --k_schedule "$K_SCHEDULE"
  fi
done

GRID_H=$(python -c "import numpy as np; print(np.load('$OUT/prep/train_dp.npz')['occ'].shape[2])")
GRID_W=$(python -c "import numpy as np; print(np.load('$OUT/prep/train_dp.npz')['occ'].shape[3])")
COMMON="--dataset prepared --T $T --use_sdf 1 --maze_h $GRID_H --maze_w $GRID_W"

# 5) D_phi segment-cost predictor
$RUNNER interpolated_diffusion_tpu.train.train_segment_cost \
  $COMMON --prepared_path "$OUT/prep/train_dp.npz" \
  --steps "$DPHI_STEPS" --batch 64 --out_dir "$OUT/dphi"

# 6) keypoint selector on D_phi-derived per-level DP labels
if [ ! -f "$OUT/prep/train_dp_dphi.npz" ]; then
  $RUNNER interpolated_diffusion_tpu.data.prepare_dp_keypoints \
    --prepared_path "$OUT/prep/train.npz" \
    --out_path "$OUT/prep/train_dp_dphi.npz" \
    --T "$T" --K "$K" --batch 128 --use_sdf 1 \
    --store_kp_mask_levels 1 --levels "$LEVELS" --k_schedule "$K_SCHEDULE" \
    --cost_source dphi --dphi_ckpt "$OUT/dphi"
fi
$RUNNER interpolated_diffusion_tpu.train.train_keypoint_selector \
  $COMMON --prepared_path "$OUT/prep/train_dp_dphi.npz" \
  --K "$K" --levels "$LEVELS" --k_schedule "$K_SCHEDULE" --use_level 1 \
  --use_goal_dist_token 1 --use_cond_bias 1 --cond_bias_mode encoder \
  --steps "$SEL_STEPS" --batch 128 --out_dir "$OUT/selector"

# 7) Stage-1 keypoints: selector/uniform/random idx mix + kp features
# (kp_feat_dim=5 = geometry + D_phi cost channels, the reference's winning
# config: run_d4rl_unified_dp_train_sample.sh KP_FEAT_DIM=5 + --dphi_ckpt)
$RUNNER interpolated_diffusion_tpu.train.train_keypoints \
  $COMMON --prepared_path "$OUT/prep/train_dp.npz" \
  --schedule cosine --N_train 1000 \
  --K "$K" --idx_policy "${IDX_POLICY:-selector:0.7,uniform:0.2,random:0.1}" \
  --selector_ckpt "$OUT/selector" \
  --use_kp_feat 1 --kp_feat_dim "${KP_FEAT_DIM:-5}" --dphi_ckpt "$OUT/dphi" \
  --steps "$STEPS" --batch "$BATCH" --out_dir "$OUT/kp"

# 8) Stage-2: the reference's winning small dist-noise recipe (uniform base
# masks, adj targets, anchor-conf anneal, bootstrap scheduled sampling,
# w_anchor 0.1 = the reference trainer default: confident anchors carry 10×
# less loss weight than missing frames)
$RUNNER interpolated_diffusion_tpu.train.train_interp_levels \
  $COMMON --prepared_path "$OUT/prep/train_dp.npz" \
  --K_min "$K" --levels "$LEVELS" --k_schedule "$K_SCHEDULE" --mode adj \
  --mask_policy "${MASK_POLICY:-uniform}" \
  --anchor_conf 1 --anchor_conf_anneal 1 --w_anchor 0.1 \
  --corrupt_mode dist --corrupt_sigma_max "${SIGMA_MAX:-0.02}" \
  --corrupt_sigma_min "${SIGMA_MIN:-0.003}" --corrupt_sigma_pow 0.75 \
  --corrupt_anchor_frac 0.25 --pos_clip 1 \
  --bootstrap_ckpt "$OUT/kp" --dphi_ckpt "$OUT/dphi" \
  --bootstrap_ddim_steps "${BOOT_DDIM_STEPS:-20}" \
  --bootstrap_replace_prob "${BOOT_REPLACE_PROB:-0.3}" \
  --bootstrap_warmup_steps "${BOOT_WARMUP:-5000}" \
  --steps "$S2_STEPS" --batch "$BATCH" --out_dir "$OUT/il"

# 9) e2e sampling on held-out eval data, with the oracle-anchor comparison
$RUNNER interpolated_diffusion_tpu.sample.generate \
  --kp_ckpt "$OUT/kp" --interp_ckpt "$OUT/il" \
  --dataset prepared --prepared_path "$OUT/prep/eval_dp.npz" \
  --kp_index_mode "${KP_INDEX_MODE:-uniform}" --selector_ckpt "$OUT/selector" \
  --dphi_ckpt "$OUT/dphi" \
  --s2_noise_mode level --s2_noise_sigma "${SIGMA_MIN:-0.003}" \
  --pos_clip 1 --compare_oracle 1 --sanity 1 \
  --num_batches "$SAMPLE_BATCHES" --batch 64 \
  --out_dir "$OUT/samples"

python scripts/log_experiment.py --title "d4rl unified T=$T smallnoise" \
  --run_dir "$OUT/il" --results "$OUT/samples/summary.json"
