#!/usr/bin/env bash
# Round-5 smoothing-pass sweep on the winning conf-override cell: can the
# ≤2x-interp smoothness clause close at held collision? (RESULTS.md round-5
# finding 3; smooth2 already cut 0.0083 -> 0.0028 at unchanged collision.)
set -u
cd "$(dirname "$0")/.."
LOG=runs/tpu_rundown_r5
mkdir -p "$LOG"
. scripts/rundown_lib.sh
B=runs/d4rl_r4
R5=runs/d4rl_r5
SAMPLE_COMMON="--dataset prepared --prepared_path $B/prep/eval_dp.npz \
  --kp_index_mode uniform --dphi_ckpt $B/dphi \
  --stage1_best_of 16 --stage1_best_of_mode dp --stage1_cache_interval 2 \
  --s2_noise_mode none --soft_anchor_clamp 1 \
  --pos_clip 1 --compare_oracle 1 --num_batches 8 --batch 64 --sanity 1"
for N in 4 6; do
  run_step r5_b16sc_conf05_smooth$N 3600 python -m \
    interpolated_diffusion_tpu.sample.generate \
    --kp_ckpt $B/kp --interp_ckpt $B/il_boot16 $SAMPLE_COMMON \
    --anchor_conf_override 0.5 --s2_delta_smooth $N \
    --out_dir $R5/samples_b16sc_conf05_smooth$N
done
echo "rundown r5f done $(date -Is)"
