#!/usr/bin/env bash
# Round-5 chip queue, in priority order, assuming the usual fresh-checkout
# runs/ wipe. Round 4 banked the boot16 A/B grid + serving sweep; what it
# cut for time is exactly this queue: the idxmix ablation (dataless FOUR
# rounds if this doesn't run — put it first), the wansynth_tiny back half,
# and the maze quality refresh. Each step is marker-gated; steps with
# missing prerequisites SKIP instead of burning their timeout.
set -u
cd "$(dirname "$0")/.."
LOG=runs/tpu_rundown_r5
mkdir -p "$LOG"

# honest marker-gated step runner (writes rc/timestamps/log into markers,
# refuses hand-touched empty markers, supports explicit .cut markers)
. scripts/rundown_lib.sh

B=runs/d4rl_r5

# ---- 1) rebuild the unified pipeline (checkpoints never survive the
# checkout wipe; ~1h56m measured in r4)
run_step d4rl_r5_unified 9000 env OUT=$B S2_STEPS=10000 \
  bash scripts/pipelines/run_d4rl_unified.sh

# ---- 2) idx-policy-mix ablation, FIRST after the rebuild (VERDICT r3 #3;
# r4 cut it when the boot16 retrain ran at 0.9 steps/s). 8k steps/arm.
if need $B/il $B/selector $B/dphi; then
  for MIX in "dp:1.0" "uniform:1.0" "selector:1.0" \
             "selector:0.7,uniform:0.2,random:0.1" \
             "dp:0.7,uniform:0.2,random:0.1"; do
    tag=$(echo "$MIX" | tr ':,.' '___')
    run_step "idxmix_r5_${tag}" 4200 env BASE=$B STEPS=${IDXMIX_STEPS:-8000} \
      MIXES="$MIX" bash scripts/pipelines/run_stage1_idxmix_ablation.sh
  done
fi

# ---- 3) wansynth_tiny staged pipeline (p1 600 -> anchors -> p2 600 -> eval)
WT=runs/wansynth_tiny
WT_DATA="--data tar --data_root $WT/data --num_samples 256 \
  --latent_c 8 --latent_h 16 --latent_w 16 --text_len 16 --text_dim 256"
WT_WAN="--use_wan 1 --wan_dim 256 --wan_layers 6 --wan_heads 4 --wan_ffn 1024 \
  --attn_mode dense --lora_rank 0 --use_remat 1 --layer_mode scan --bf16 1"
run_step wt_data 1200 python -m interpolated_diffusion_tpu.data.make_synth_tars \
  --out_root $WT/data --num_samples 256 --T 21 \
  --latent_c 8 --latent_h 16 --latent_w 16 --text_len 16 --text_dim 256
if need $WT/data; then
  run_step wt_p1 3600 python -m \
    interpolated_diffusion_tpu.train.train_keypoints_wansynth \
    $WT_DATA $WT_WAN --T 21 --K 5 \
    --phase1_input_mode short_anchors --frame_cond 1 --cond_drop_prob 0.1 \
    --batch 2 --grad_accum 2 --steps 600 --save_every 600 --out_dir $WT/p1
fi
if need $WT/p1/ckpt_600; then
  run_step wt_anchors 3600 python -m \
    interpolated_diffusion_tpu.data.precompute_phase1_anchors \
    --ckpt $WT/p1/ckpt_600 --out_root $WT/anchors \
    --data tar --data_root $WT/data --batch 2 --ddim_steps 4
fi
if compgen -G "$WT/anchors/*.tar" > /dev/null; then
  # (tar-mode precompute mirrors source basenames — shard_*.tar — for the
  # key-join; the old anchors_*.tar glob silently skipped p2)
  run_step wt_p2 5400 python -m \
    interpolated_diffusion_tpu.train.train_interp_levels_wansynth \
    $WT_DATA $WT_WAN --T 21 --K_min 5 --levels 2 --mode adj \
    --anchors_root $WT/anchors \
    --batch 2 --grad_accum 2 --steps 600 --save_every 600 --out_dir $WT/p2
fi
if need $WT/p2/ckpt_600; then
  run_step wt_eval 2400 python -m \
    interpolated_diffusion_tpu.diagnostics.eval_wansynth_stage2 \
    --p2_ckpt $WT/p2/ckpt_600 --p1_ckpt $WT/p1/ckpt_600 \
    --data tar --data_root $WT/data --anchors_root $WT/anchors \
    --batch 2 --num_batches 16 --out_dir $WT/eval_stage2
fi

# ---- 4) maze quality refresh (stale docs/maze_quality_summary.json)
run_step maze_prep 3600 python -m \
  interpolated_diffusion_tpu.data.prepare_dp_keypoints \
  --out_path runs/maze_q10k/prep/dp.npz --T 64 --K 8 --num_samples 20000 \
  --store_kp_mask_levels 1 --levels 3
if need runs/maze_q10k/prep/dp.npz; then
  run_step maze_kp 7200 python -m \
    interpolated_diffusion_tpu.train.train_keypoints \
    --dataset prepared --prepared_path runs/maze_q10k/prep/dp.npz --T 64 --K 8 \
    --idx_policy "dp:0.5,uniform:0.3,random:0.2" \
    --steps 10000 --batch 256 --out_dir runs/maze_q10k/kp
fi
if compgen -G "runs/maze_q10k/kp/ckpt_*" > /dev/null; then
  run_step maze_il 14400 python -m \
    interpolated_diffusion_tpu.train.train_interp_levels \
    --dataset prepared --prepared_path runs/maze_q10k/prep/dp.npz --T 64 \
    --K_min 8 --levels 3 --mode adj --anchor_conf 1 --anchor_conf_anneal 1 \
    --corrupt_mode dist --corrupt_sigma_max 0.02 \
    --bootstrap_ckpt runs/maze_q10k/kp \
    --steps 20000 --batch 256 --out_dir runs/maze_q10k/il
fi
if compgen -G "runs/maze_q10k/il/ckpt_*" > /dev/null; then
  run_step maze_sample_r5 3600 python -m \
    interpolated_diffusion_tpu.sample.generate \
    --kp_ckpt runs/maze_q10k/kp --interp_ckpt runs/maze_q10k/il \
    --dataset prepared --prepared_path runs/maze_q10k/prep/dp.npz \
    --kp_index_mode uniform --clamp_policy all_anchors \
    --compare_oracle 1 --num_batches 8 --batch 64 --sanity 1 \
    --out_dir runs/maze_q10k/samples_uniform
  cp runs/maze_q10k/samples_uniform/summary.json \
     docs/maze_quality_summary.json 2>/dev/null || true
fi

# ---- 5) gates
run_step bench_r5 2400 python bench.py
run_step kernels_r5 2400 python scripts/verify_kernel_tpu.py

echo "rundown r5 complete $(date)"
