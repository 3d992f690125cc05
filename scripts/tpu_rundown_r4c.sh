#!/usr/bin/env bash
# Round-4 session-C chip queue. Fresh checkout wiped runs/ again, so this
# rebuilds the unified D4RL pipeline first, then runs the round's gate (the
# boot16 Stage-2 retrain + the {il, il_boot16} x {sampler} grid as SEPARATE
# marker-gated steps so a timeout never discards finished cells — ADVICE r3),
# then the idxmix ablation (dataless for three rounds), the wansynth_tiny
# pipeline STAGED per step, the serving saturation sweep, and the bench/kernel
# gates. Shares runs/tpu_rundown_r4 markers with the r4/r4b queues.
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

B=runs/d4rl_r4

# ---- 1) rebuild the D4RL T=128 winning pipeline (~1h50m; auto-archives
# evidence into docs/results/)
run_step d4rl_r4_unified 9000 env OUT=$B S2_STEPS=10000 \
  bash scripts/pipelines/run_d4rl_unified.sh

# ---- 2) THE round-4 gate: Stage-2 retrained on dp best-of-16 bootstrap
# anchors. Train ONLY here (save_every 2000 so a timeout still leaves a
# usable ckpt); the A/B cells are separate steps below.
if need $B/kp $B/il $B/dphi; then
  GRID_H=$(python -c "import numpy as np; print(np.load('$B/prep/train_dp.npz')['occ'].shape[2])")
  GRID_W=$(python -c "import numpy as np; print(np.load('$B/prep/train_dp.npz')['occ'].shape[3])")
  run_step boot16_train 10000 python -m \
    interpolated_diffusion_tpu.train.train_interp_levels \
    --dataset prepared --T 128 --use_sdf 1 --maze_h "$GRID_H" --maze_w "$GRID_W" \
    --prepared_path $B/prep/train_dp.npz \
    --K_min 8 --levels 8 --k_schedule geom --mode adj \
    --mask_policy uniform \
    --anchor_conf 1 --anchor_conf_anneal 1 --w_anchor 0.1 \
    --corrupt_mode dist --corrupt_sigma_max 0.02 \
    --corrupt_sigma_min 0.003 --corrupt_sigma_pow 0.75 \
    --corrupt_anchor_frac 0.25 --pos_clip 1 \
    --bootstrap_ckpt $B/kp --dphi_ckpt $B/dphi \
    --bootstrap_best_of 16 --bootstrap_best_of_mode dp \
    --bootstrap_ddim_steps 8 --bootstrap_replace_prob 0.5 \
    --bootstrap_warmup_steps 2000 \
    --steps 10000 --batch 256 --save_every 2000 --out_dir $B/il_boot16
fi

# ---- 3) the A/B grid, one marker-gated cell at a time. SAMPLE_COMMON uses
# the held-out eval set, oracle comparison, sanity verdicts.
SAMPLE_COMMON="--dataset prepared --prepared_path $B/prep/eval_dp.npz \
  --kp_index_mode uniform --dphi_ckpt $B/dphi \
  --pos_clip 1 --compare_oracle 1 --num_batches 8 --batch 64 --sanity 1"
BO16="--stage1_best_of 16 --stage1_best_of_mode dp --stage1_cache_interval 2"
if compgen -G "$B/il_boot16/ckpt_*" > /dev/null; then
  # cell A (THE open item): does the boot16 retrain fix the refined-vs-interp
  # collision sign at PLAIN uniform predicted anchors (softclamp sampling)?
  run_step d4rl_r4_uniform_boot16 1800 python -m \
    interpolated_diffusion_tpu.sample.generate \
    --kp_ckpt $B/kp --interp_ckpt $B/il_boot16 $SAMPLE_COMMON \
    --s2_noise_mode none --soft_anchor_clamp 1 \
    --out_dir $B/samples_uniform_boot16
  # cell B: original il under identical sampling (grid baseline, r4 ckpts)
  run_step d4rl_r4_uniform_il 1800 python -m \
    interpolated_diffusion_tpu.sample.generate \
    --kp_ckpt $B/kp --interp_ckpt $B/il $SAMPLE_COMMON \
    --s2_noise_mode none --soft_anchor_clamp 1 \
    --out_dir $B/samples_uniform_il
  # cell C: boot16 under the best sampler (dp best-of-16 + softclamp)
  run_step r4b_bestof16_boot16_softclamp 1800 python -m \
    interpolated_diffusion_tpu.sample.generate \
    --kp_ckpt $B/kp --interp_ckpt $B/il_boot16 $SAMPLE_COMMON $BO16 \
    --s2_noise_mode none --soft_anchor_clamp 1 \
    --out_dir $B/samples_bestof16_boot16_softclamp
  # cell D: original il under dp best-of-16 + level noise (r3 headline
  # sampler reproduced on THIS round's checkpoints)
  run_step d4rl_r4_bestof16_il 1800 python -m \
    interpolated_diffusion_tpu.sample.generate \
    --kp_ckpt $B/kp --interp_ckpt $B/il $SAMPLE_COMMON $BO16 \
    --s2_noise_mode level --s2_noise_sigma 0.003 \
    --out_dir $B/samples_bestof16
  # cell E: boot16 under dp best-of-16 + level noise (training-dist effect
  # under the sampler whose anchors it was trained on)
  run_step r4b_bestof16_boot16 1800 python -m \
    interpolated_diffusion_tpu.sample.generate \
    --kp_ckpt $B/kp --interp_ckpt $B/il_boot16 $SAMPLE_COMMON $BO16 \
    --s2_noise_mode level --s2_noise_sigma 0.003 \
    --out_dir $B/samples_bestof16_boot16
fi

# ---- 4) Stage-1 idx-policy-mix ablation (queued since round 1). 8k steps
# per arm (uniform budget across arms keeps the ranking valid and fits five
# arms in the session; deviation from the 12k plan noted in RESULTS.md).
if need $B/il $B/selector $B/dphi; then
  for MIX in "dp:1.0" "uniform:1.0" "selector:1.0" \
             "selector:0.7,uniform:0.2,random:0.1" \
             "dp:0.7,uniform:0.2,random:0.1"; do
    tag=$(echo "$MIX" | tr ':,.' '___')
    run_step "idxmix_r4_${tag}" 4200 env BASE=$B STEPS=${IDXMIX_STEPS:-8000} \
      MIXES="$MIX" bash scripts/pipelines/run_stage1_idxmix_ablation.sh
  done
fi

# ---- 5) wansynth_tiny, STAGED (ADVICE r3: one stage per timeout window).
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
if compgen -G "$WT/anchors/anchors_*.tar" > /dev/null; then
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

# ---- 6) serving saturation sweep (VERDICT weak #3)
if need $B/kp $B/il; then
  run_step serving_sweep_r4 4800 python scripts/bench_serving_sweep.py \
    --kp_ckpt $B/kp --interp_ckpt $B/il \
    --prepared_path $B/prep/eval_dp.npz \
    --out_json $LOG/serving_sweep_r4.json
fi

# ---- 7) gates: bench + on-chip kernel oracles
run_step bench_r4 2400 python bench.py
run_step kernels_r4 2400 python scripts/verify_kernel_tpu.py

echo "rundown r4c complete $(date)"
