#!/usr/bin/env bash
# Round-3 TPU work queue. Each step logs under runs/tpu_rundown and failures
# don't stop later steps. Safe to re-run; finished steps are skipped via
# their marker files. Keep this file under 8 KB: bash buffers the whole
# script at launch only then, making edits-while-running safe.
set -u
cd "$(dirname "$0")/.."
LOG=runs/tpu_rundown
mkdir -p "$LOG"

run_step() {  # run_step <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  if [ -f "$LOG/$name.done" ]; then echo "== $name: already done"; return 0; fi
  echo "== $name: start $(date)"
  if timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1; then
    touch "$LOG/$name.done"; echo "== $name: OK"
  else
    echo "== $name: FAILED rc=$? (see $LOG/$name.log)"
  fi
}

# 0) rebuild the maze checkpoints (runs/ is gitignored); docs/RESULTS.md recipe
run_step maze_prep 3600 python -m \
  interpolated_diffusion_tpu.data.prepare_dp_keypoints \
  --out_path runs/maze_q10k/prep/dp.npz --T 64 --K 8 --num_samples 20000 \
  --store_kp_mask_levels 1 --levels 3
run_step maze_kp 7200 python -m \
  interpolated_diffusion_tpu.train.train_keypoints \
  --dataset prepared --prepared_path runs/maze_q10k/prep/dp.npz --T 64 --K 8 \
  --idx_policy "dp:0.5,uniform:0.3,random:0.2" \
  --steps 10000 --batch 256 --out_dir runs/maze_q10k/kp
run_step maze_il 14400 python -m \
  interpolated_diffusion_tpu.train.train_interp_levels \
  --dataset prepared --prepared_path runs/maze_q10k/prep/dp.npz --T 64 \
  --K_min 8 --levels 3 --mode adj --anchor_conf 1 --anchor_conf_anneal 1 \
  --corrupt_mode dist --corrupt_sigma_max 0.02 \
  --bootstrap_ckpt runs/maze_q10k/kp \
  --steps 20000 --batch 256 --out_dir runs/maze_q10k/il_20k_s002

# 1) D4RL T=128 unified, reference winning recipe (round-3 gate): D=2, w_anchor 0.1
if [ ! -d runs/d4rl_r3/prep ]; then
  mkdir -p runs/d4rl_r3/prep
  ls runs/d4rl_r2/prep/ep_*.npz >/dev/null 2>&1 && \
    cp runs/d4rl_r2/prep/ep_*.npz runs/d4rl_r3/prep/ || true
fi
run_step d4rl_r3_unified 28800 env OUT=runs/d4rl_r3 S2_STEPS=10000 \
  bash scripts/pipelines/run_d4rl_unified.sh

run_step d4rl_r3_sample_selector 3600 python -m \
  interpolated_diffusion_tpu.sample.generate \
  --kp_ckpt runs/d4rl_r3/kp --interp_ckpt runs/d4rl_r3/il \
  --dataset prepared --prepared_path runs/d4rl_r3/prep/eval_dp.npz \
  --kp_index_mode selector --selector_ckpt runs/d4rl_r3/selector \
  --dphi_ckpt runs/d4rl_r3/dphi \
  --s2_noise_mode level --s2_noise_sigma 0.003 \
  --pos_clip 1 --compare_oracle 1 --num_batches 8 --batch 64 \
  --sanity 1 --out_dir runs/d4rl_r3/samples_selector

run_step d4rl_r3_sample_fora 3600 python -m \
  interpolated_diffusion_tpu.sample.generate \
  --kp_ckpt runs/d4rl_r3/kp --interp_ckpt runs/d4rl_r3/il \
  --dataset prepared --prepared_path runs/d4rl_r3/prep/eval_dp.npz \
  --kp_index_mode uniform --dphi_ckpt runs/d4rl_r3/dphi \
  --stage1_cache_interval 2 \
  --s2_noise_mode level --s2_noise_sigma 0.003 \
  --pos_clip 1 --num_batches 8 --batch 64 \
  --sanity 1 --out_dir runs/d4rl_r3/samples_fora2

run_step d4rl_r3_sample_bestof16 5400 python -m \
  interpolated_diffusion_tpu.sample.generate \
  --kp_ckpt runs/d4rl_r3/kp --interp_ckpt runs/d4rl_r3/il \
  --dataset prepared --prepared_path runs/d4rl_r3/prep/eval_dp.npz \
  --kp_index_mode uniform --dphi_ckpt runs/d4rl_r3/dphi \
  --stage1_best_of 16 --stage1_best_of_mode dp --stage1_cache_interval 2 \
  --s2_noise_mode level --s2_noise_sigma 0.003 \
  --pos_clip 1 --compare_oracle 1 --num_batches 8 --batch 64 \
  --sanity 1 --out_dir runs/d4rl_r3/samples_bestof16

# 2) bench regression gate (the driver's metric) + kernel oracle pass
run_step bench_r3 2400 python bench.py
run_step kernels_r3 2400 python scripts/verify_kernel_tpu.py
# batch + small-L-attention-policy sweep (bench_r3 regressed 4615->4150)
run_step bench_sweep_r3 3600 python scripts/bench_sweep.py

# 3) refined-collision ablation: noise off / +soft clamp / reference-exact
#    sampling (corruption-schedule sigma + soft clamp 0.1).
run_step d4rl_r3_sample_nonoise 3600 python -m \
  interpolated_diffusion_tpu.sample.generate \
  --kp_ckpt runs/d4rl_r3/kp --interp_ckpt runs/d4rl_r3/il \
  --dataset prepared --prepared_path runs/d4rl_r3/prep/eval_dp.npz \
  --kp_index_mode uniform --dphi_ckpt runs/d4rl_r3/dphi \
  --s2_noise_mode none \
  --pos_clip 1 --compare_oracle 1 --num_batches 8 --batch 64 \
  --sanity 1 --out_dir runs/d4rl_r3/samples_nonoise
run_step d4rl_r3_sample_nonoise_softclamp 3600 python -m \
  interpolated_diffusion_tpu.sample.generate \
  --kp_ckpt runs/d4rl_r3/kp --interp_ckpt runs/d4rl_r3/il \
  --dataset prepared --prepared_path runs/d4rl_r3/prep/eval_dp.npz \
  --kp_index_mode uniform --dphi_ckpt runs/d4rl_r3/dphi \
  --s2_noise_mode none --soft_anchor_clamp 1 \
  --pos_clip 1 --compare_oracle 1 --num_batches 8 --batch 64 \
  --sanity 1 --out_dir runs/d4rl_r3/samples_nonoise_softclamp
run_step d4rl_r3_sample_refexact 3600 python -m \
  interpolated_diffusion_tpu.sample.generate \
  --kp_ckpt runs/d4rl_r3/kp --interp_ckpt runs/d4rl_r3/il \
  --dataset prepared --prepared_path runs/d4rl_r3/prep/eval_dp.npz \
  --kp_index_mode uniform --dphi_ckpt runs/d4rl_r3/dphi \
  --s2_noise_mode level --s2_noise_sigma 0.02 --s2_sigma_min 0.003 \
  --s2_sigma_pow 0.75 --soft_anchor_clamp 1 --soft_clamp_max 0.1 \
  --pos_clip 1 --compare_oracle 1 --num_batches 8 --batch 64 \
  --sanity 1 --out_dir runs/d4rl_r3/samples_refexact

# 4) serving-layer throughput/latency after the round-3 pipelining fix
run_step bench_serving_r3 2400 python scripts/bench_serving.py \
  --kp_ckpt runs/maze_q10k/kp --interp_ckpt runs/maze_q10k/il_20k_s002 \
  --prepared_path runs/maze_q10k/prep/dp.npz \
  --requests 256 --concurrency 16 --rows_per_request 4 \
  --out_json runs/tpu_rundown/bench_serving_r3.json

# 5) autotune retry (VERDICT weak #8)
run_step autotune_attn_r3 3600 python scripts/autotune_attention.py

# 6) Stage-2 under the BEST sampler (VERDICT weak #2), maze:
run_step maze_il_boot16 14400 python -m \
  interpolated_diffusion_tpu.train.train_interp_levels \
  --dataset prepared --prepared_path runs/maze_q10k/prep/dp.npz --T 64 \
  --K_min 8 --levels 3 --mode adj --anchor_conf 1 --anchor_conf_anneal 1 \
  --corrupt_mode dist --corrupt_sigma_max 0.02 \
  --bootstrap_ckpt runs/maze_q10k/kp \
  --bootstrap_best_of 16 --bootstrap_best_of_mode dp \
  --bootstrap_ddim_steps 8 --bootstrap_replace_prob 0.5 \
  --steps 20000 --batch 256 --out_dir runs/maze_q10k/il_boot16
for ILV in il_20k_s002 il_boot16; do
  run_step "maze_bestof16_${ILV}" 3600 python -m \
    interpolated_diffusion_tpu.sample.generate \
    --kp_ckpt runs/maze_q10k/kp --interp_ckpt "runs/maze_q10k/${ILV}" \
    --dataset prepared --prepared_path runs/maze_q10k/prep/dp.npz \
    --kp_index_mode uniform --stage1_best_of 16 --stage1_best_of_mode dp \
    --compare_oracle 1 --num_batches 8 --batch 64 --sanity 1 \
    --out_dir "runs/maze_q10k/samples_bestof16_${ILV}"
done

# 6b) same experiment on the headline dataset (D4RL):
run_step d4rl_il_boot16 14400 env BASE=runs/d4rl_r3 \
  bash scripts/pipelines/run_d4rl_stage2_boot16.sh

# 7) from-scratch tiny-WanDiT wansynth pipeline (VERDICT 6b: video path TRAINS);
#    dense attn: block-sparse degenerates at 1344 tokens.
run_step wansynth_tiny 10800 env OUT=runs/wansynth_tiny \
  STEPS=800 NUM_SAMPLES=256 BATCH=2 GRAD_ACCUM=2 K=5 LEVELS=2 \
  ATTN=dense LORA_RANK=0 SAVE_EVERY=800 FLOW_STEPS=800 \
  EXTRA_DATA_ARGS="--latent_c 8 --latent_h 16 --latent_w 16 --text_len 16 --text_dim 256" \
  EXTRA_WAN_ARGS="--wan_dim 256 --wan_layers 6 --wan_heads 4 --wan_ffn 1024" \
  bash scripts/pipelines/run_wansynth_full.sh

# 8) Stage-1 idx-policy-mix ablation vs the same Stage-2 (round-1 VERDICT item)
for MIX in "dp:1.0" "uniform:1.0" "selector:1.0" \
           "selector:0.7,uniform:0.2,random:0.1" \
           "dp:0.7,uniform:0.2,random:0.1"; do
  tag=$(echo "$MIX" | tr ':,.' '___')
  run_step "idxmix_r3_${tag}" 6000 env BASE=runs/d4rl_r3 STEPS=12000 \
    MIXES="$MIX" bash scripts/pipelines/run_stage1_idxmix_ablation.sh
done


echo "rundown complete $(date)"
