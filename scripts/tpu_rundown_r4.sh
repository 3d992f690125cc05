#!/usr/bin/env bash
# Round-4 TPU work queue, in VERDICT-r3 priority order: the boot16 Stage-2
# retrain chain FIRST (round 3 died with it still queued), then the idxmix
# ablation, the wansynth_tiny back half, the serving saturation sweep, the
# maze quality refresh, and the bench/kernel gates. Each step logs under
# runs/tpu_rundown_r4; finished steps are skipped via marker files, and
# steps with missing prerequisites are SKIPPED (not run to their timeout —
# ADVICE r3). Keep this file small: bash buffers the whole script at launch.
set -u
cd "$(dirname "$0")/.."
LOG=runs/tpu_rundown_r4
mkdir -p "$LOG"

run_step() {  # run_step <name> <timeout_s> <cmd...> -> rc
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

need() {  # need <path...> -> 0 iff all exist
  local p; for p in "$@"; do
    [ -e "$p" ] || { echo "== SKIP (missing prerequisite: $p)"; return 1; }
  done
}

# ---- 1) rebuild the D4RL T=128 winning pipeline (checkpoints were wiped
# with runs/); ~1h50m per docs/RESULTS.md. Evidence now auto-archives into
# docs/results/ via utils.run_config.archive_evidence.
run_step d4rl_r4_unified 14400 env OUT=runs/d4rl_r4 S2_STEPS=10000 \
  bash scripts/pipelines/run_d4rl_unified.sh

# ---- 2) THE round-4 gate: Stage-2 retrained on dp best-of-16 bootstrap
# anchors + the {il, il_boot16} x {level-noise, softclamp} A/B grid.
if need runs/d4rl_r4/kp runs/d4rl_r4/il runs/d4rl_r4/dphi; then
  run_step d4rl_il_boot16 14400 env BASE=runs/d4rl_r4 \
    bash scripts/pipelines/run_d4rl_stage2_boot16.sh
  # grid completion: original il under dp best-of-16 + level noise (the r3
  # headline sampler) so all four cells come from THIS round's checkpoints
  run_step d4rl_r4_bestof16_il 3600 python -m \
    interpolated_diffusion_tpu.sample.generate \
    --kp_ckpt runs/d4rl_r4/kp --interp_ckpt runs/d4rl_r4/il \
    --dataset prepared --prepared_path runs/d4rl_r4/prep/eval_dp.npz \
    --kp_index_mode uniform --dphi_ckpt runs/d4rl_r4/dphi \
    --stage1_best_of 16 --stage1_best_of_mode dp --stage1_cache_interval 2 \
    --s2_noise_mode level --s2_noise_sigma 0.003 \
    --pos_clip 1 --compare_oracle 1 --num_batches 8 --batch 64 \
    --sanity 1 --out_dir runs/d4rl_r4/samples_bestof16
  # uniform-anchor softclamp sample of il_boot16 (does the retrain fix the
  # refined-collision sign at PLAIN predicted anchors, the actual open item)
  if need runs/d4rl_r4/il_boot16; then
    run_step d4rl_r4_uniform_boot16 3600 python -m \
      interpolated_diffusion_tpu.sample.generate \
      --kp_ckpt runs/d4rl_r4/kp --interp_ckpt runs/d4rl_r4/il_boot16 \
      --dataset prepared --prepared_path runs/d4rl_r4/prep/eval_dp.npz \
      --kp_index_mode uniform --dphi_ckpt runs/d4rl_r4/dphi \
      --s2_noise_mode none --soft_anchor_clamp 1 \
      --pos_clip 1 --compare_oracle 1 --num_batches 8 --batch 64 \
      --sanity 1 --out_dir runs/d4rl_r4/samples_uniform_boot16
    run_step d4rl_r4_uniform_il 3600 python -m \
      interpolated_diffusion_tpu.sample.generate \
      --kp_ckpt runs/d4rl_r4/kp --interp_ckpt runs/d4rl_r4/il \
      --dataset prepared --prepared_path runs/d4rl_r4/prep/eval_dp.npz \
      --kp_index_mode uniform --dphi_ckpt runs/d4rl_r4/dphi \
      --s2_noise_mode none --soft_anchor_clamp 1 \
      --pos_clip 1 --compare_oracle 1 --num_batches 8 --batch 64 \
      --sanity 1 --out_dir runs/d4rl_r4/samples_uniform_il
  fi
fi

# ---- 3) Stage-1 idx-policy-mix ablation (queued since round 1; 12k steps
# per arm, sampled against the same Stage-2)
if need runs/d4rl_r4/il runs/d4rl_r4/selector runs/d4rl_r4/dphi; then
  for MIX in "dp:1.0" "uniform:1.0" "selector:1.0" \
             "selector:0.7,uniform:0.2,random:0.1" \
             "dp:0.7,uniform:0.2,random:0.1"; do
    tag=$(echo "$MIX" | tr ':,.' '___')
    run_step "idxmix_r4_${tag}" 7200 env BASE=runs/d4rl_r4 STEPS=12000 \
      MIXES="$MIX" bash scripts/pipelines/run_stage1_idxmix_ablation.sh
  done
fi

# ---- 4) wansynth_tiny back half on the surviving 600-step Phase-1
WT=runs/wansynth_tiny
WT_DATA="--data tar --data_root $WT/data --num_samples 256 \
  --latent_c 8 --latent_h 16 --latent_w 16 --text_len 16 --text_dim 256"
WT_WAN="--use_wan 1 --wan_dim 256 --wan_layers 6 --wan_heads 4 --wan_ffn 1024 \
  --attn_mode dense --lora_rank 0 --use_remat 1 --layer_mode scan --bf16 1"
if need $WT/p1/ckpt_600 $WT/data; then
  run_step wt_anchors 3600 python -m \
    interpolated_diffusion_tpu.data.precompute_phase1_anchors \
    --ckpt $WT/p1/ckpt_600 --out_root $WT/anchors \
    --data tar --data_root $WT/data --batch 2 --ddim_steps 4
  if need $WT/anchors/anchors_00000.tar; then
    run_step wt_p2 7200 python -m \
      interpolated_diffusion_tpu.train.train_interp_levels_wansynth \
      $WT_DATA $WT_WAN --T 21 --K_min 5 --levels 2 --mode adj \
      --anchors_root $WT/anchors \
      --batch 2 --grad_accum 2 --steps 600 --save_every 600 \
      --out_dir $WT/p2
    if need $WT/p2/ckpt_600; then
      run_step wt_eval 3600 python -m \
        interpolated_diffusion_tpu.diagnostics.eval_wansynth_stage2 \
        --p2_ckpt $WT/p2/ckpt_600 --p1_ckpt $WT/p1/ckpt_600 \
        --data tar --data_root $WT/data --anchors_root $WT/anchors \
        --batch 2 --num_batches 16 --out_dir $WT/eval_stage2
    fi
  fi
fi

# ---- 5) serving saturation sweep (VERDICT weak #3): rows x linger x
# concurrency grid + per-request budget breakdown -> docs/SERVING.md
if need runs/d4rl_r4/kp runs/d4rl_r4/il; then
  run_step serving_sweep_r4 7200 python scripts/bench_serving_sweep.py \
    --kp_ckpt runs/d4rl_r4/kp --interp_ckpt runs/d4rl_r4/il \
    --prepared_path runs/d4rl_r4/prep/eval_dp.npz \
    --out_json runs/tpu_rundown_r4/serving_sweep_r4.json
fi

# ---- 6) refresh the stale docs/maze_quality_summary.json (VERDICT #2):
# rebuild maze_q10k and run the bestof16 A/B on particle maze
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
  if need runs/maze_q10k/kp; then
    run_step maze_il 14400 python -m \
      interpolated_diffusion_tpu.train.train_interp_levels \
      --dataset prepared --prepared_path runs/maze_q10k/prep/dp.npz --T 64 \
      --K_min 8 --levels 3 --mode adj --anchor_conf 1 --anchor_conf_anneal 1 \
      --corrupt_mode dist --corrupt_sigma_max 0.02 \
      --bootstrap_ckpt runs/maze_q10k/kp \
      --steps 20000 --batch 256 --out_dir runs/maze_q10k/il
    if need runs/maze_q10k/il; then
      run_step maze_sample_r4 3600 python -m \
        interpolated_diffusion_tpu.sample.generate \
        --kp_ckpt runs/maze_q10k/kp --interp_ckpt runs/maze_q10k/il \
        --dataset prepared --prepared_path runs/maze_q10k/prep/dp.npz \
        --kp_index_mode uniform --clamp_policy all_anchors \
        --compare_oracle 1 --num_batches 8 --batch 64 --sanity 1 \
        --out_dir runs/maze_q10k/samples_uniform
      run_step maze_bestof16_r4 5400 python -m \
        interpolated_diffusion_tpu.sample.generate \
        --kp_ckpt runs/maze_q10k/kp --interp_ckpt runs/maze_q10k/il \
        --dataset prepared --prepared_path runs/maze_q10k/prep/dp.npz \
        --kp_index_mode uniform --stage1_best_of 16 --stage1_best_of_mode dp \
        --stage1_cache_interval 2 --clamp_policy all_anchors \
        --compare_oracle 1 --num_batches 8 --batch 64 --sanity 1 \
        --out_dir runs/maze_q10k/samples_bestof16
      cp runs/maze_q10k/samples_uniform/summary.json \
         docs/maze_quality_summary.json 2>/dev/null || true
    fi
  fi
fi

# ---- 7) gates: bench + on-chip kernel oracles
run_step bench_r4 2400 python bench.py
run_step kernels_r4 2400 python scripts/verify_kernel_tpu.py

echo "rundown r4 complete $(date)"
