#!/usr/bin/env bash
# Final-session maze_q10k quality refresh (VERDICT r4 weak #5: the committed
# docs/maze_quality_summary.json is still the stale 3k-step run). Prep is
# done separately on CPU (runs/maze_q10k/prep/dp.npz); this chains the chip
# stages: kp 10k -> il 20k (reference-best recipe: dist-noise sigma 0.02,
# bootstrap, anchor-conf) -> 512-sample eval -> refresh the committed summary.
set -u
cd "$(dirname "$0")/.."
LOG=runs/tpu_rundown_r5
mkdir -p "$LOG"
. scripts/rundown_lib.sh

if need runs/maze_q10k/prep/dp.npz; then
  run_step maze_kp 2400 python -m \
    interpolated_diffusion_tpu.train.train_keypoints \
    --dataset prepared --prepared_path runs/maze_q10k/prep/dp.npz --T 64 --K 8 \
    --idx_policy "dp:0.5,uniform:0.3,random:0.2" \
    --steps 10000 --batch 256 --out_dir runs/maze_q10k/kp
fi
if compgen -G "runs/maze_q10k/kp/ckpt_*" > /dev/null; then
  run_step maze_il 3600 python -m \
    interpolated_diffusion_tpu.train.train_interp_levels \
    --dataset prepared --prepared_path runs/maze_q10k/prep/dp.npz --T 64 \
    --K_min 8 --levels 3 --mode adj --anchor_conf 1 --anchor_conf_anneal 1 \
    --corrupt_mode dist --corrupt_sigma_max 0.02 \
    --bootstrap_ckpt runs/maze_q10k/kp \
    --steps 12000 --save_every 4000 --batch 256 --out_dir runs/maze_q10k/il
fi
if compgen -G "runs/maze_q10k/il/ckpt_*" > /dev/null; then
  run_step maze_sample_r5 1800 python -m \
    interpolated_diffusion_tpu.sample.generate \
    --kp_ckpt runs/maze_q10k/kp --interp_ckpt runs/maze_q10k/il \
    --dataset prepared --prepared_path runs/maze_q10k/prep/dp.npz \
    --kp_index_mode uniform --clamp_policy all_anchors \
    --compare_oracle 1 --num_batches 8 --batch 64 --sanity 1 \
    --out_dir runs/maze_q10k/samples_uniform
  cp runs/maze_q10k/samples_uniform/summary.json \
     docs/maze_quality_summary.json 2>/dev/null || true
fi
echo "rundown r5j done $(date -Is)"
