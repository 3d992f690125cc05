#!/usr/bin/env bash
# Round-5 chip queue, adapted to the state that actually survived into this
# round: runs/d4rl_r4 is intact (kp, il/ckpt_10000, il_boot16/ckpt_6000,
# selector, dphi, prep), so the unified rebuild is NOT needed and the
# boot16 retrain RESUMES from ckpt_6000 instead of restarting.
#
# Sections (args; default = all, in VERDICT-r4 priority order):
#   boot16   resume il_boot16 6k->10k, re-run the A/B grid cells at 10k
#   serving  quick shape-identical T=64 ckpts + the saturation sweep
#            (VERDICT #4 — third round for this item)
#   profile  scripts/profile_pipeline.py on chip (VERDICT #5)
#   idxmix   the 5-arm Stage-1 policy-mix ablation (VERDICT #2 — dataless
#            four rounds)
#   wansynth wansynth_tiny staged pipeline at trained scale (VERDICT #3)
#   maze     maze quality refresh (stale docs/maze_quality_summary.json)
#   gates    bench + kernel oracle check
set -u
cd "$(dirname "$0")/.."
LOG=runs/tpu_rundown_r5
mkdir -p "$LOG"
. scripts/rundown_lib.sh

SECTIONS=${*:-boot16 serving profile idxmix wansynth maze gates}
has() { case " $SECTIONS " in *" $1 "*) return 0 ;; *) return 1 ;; esac; }

B=runs/d4rl_r4
R5=runs/d4rl_r5
mkdir -p "$R5"

# ---- 1) boot16: finish the Stage-2 retrain that timed out at 6k/10k
# (VERDICT #1: the unequal A/B). Exact training args from
# scripts/pipelines/run_d4rl_stage2_boot16.sh + --resume.
if has boot16; then
  run_step boot16_resume 9000 python -m \
    interpolated_diffusion_tpu.train.train_interp_levels \
    --dataset prepared --T 128 --use_sdf 1 --maze_h 12 --maze_w 9 \
    --prepared_path $B/prep/train_dp.npz \
    --K_min 8 --levels 8 --k_schedule geom --mode adj \
    --mask_policy uniform \
    --anchor_conf 1 --anchor_conf_anneal 1 --w_anchor 0.1 \
    --corrupt_mode dist --corrupt_sigma_max 0.02 \
    --corrupt_sigma_min 0.003 --corrupt_sigma_pow 0.75 \
    --corrupt_anchor_frac 0.25 --pos_clip 1 \
    --bootstrap_ckpt $B/kp --dphi_ckpt $B/dphi \
    --bootstrap_best_of 16 --bootstrap_best_of_mode dp \
    --bootstrap_ddim_steps 8 \
    --bootstrap_replace_prob 0.5 --bootstrap_warmup_steps 2000 \
    --resume $B/il_boot16 \
    --steps 10000 --batch 256 --out_dir $B/il_boot16
  # equal-budget A/B grid at ckpt_10000 (fresh r5 out_dirs so the r4
  # 6k-step evidence in docs/results/ stays distinct)
  if need $B/il_boot16/ckpt_10000; then
    run_step r5_bestof16_boot16 3600 python -m \
      interpolated_diffusion_tpu.sample.generate \
      --kp_ckpt $B/kp --interp_ckpt $B/il_boot16 \
      --dataset prepared --prepared_path $B/prep/eval_dp.npz \
      --kp_index_mode uniform --dphi_ckpt $B/dphi \
      --stage1_best_of 16 --stage1_best_of_mode dp --stage1_cache_interval 2 \
      --s2_noise_mode level --s2_noise_sigma 0.003 \
      --pos_clip 1 --compare_oracle 1 --num_batches 8 --batch 64 \
      --sanity 1 --out_dir $R5/samples_bestof16_boot16
    run_step r5_bestof16_boot16_softclamp 3600 python -m \
      interpolated_diffusion_tpu.sample.generate \
      --kp_ckpt $B/kp --interp_ckpt $B/il_boot16 \
      --dataset prepared --prepared_path $B/prep/eval_dp.npz \
      --kp_index_mode uniform --dphi_ckpt $B/dphi \
      --stage1_best_of 16 --stage1_best_of_mode dp --stage1_cache_interval 2 \
      --s2_noise_mode none --soft_anchor_clamp 1 \
      --pos_clip 1 --compare_oracle 1 --num_batches 8 --batch 64 \
      --sanity 1 --out_dir $R5/samples_bestof16_boot16_softclamp
    run_step r5_uniform_boot16 3600 python -m \
      interpolated_diffusion_tpu.sample.generate \
      --kp_ckpt $B/kp --interp_ckpt $B/il_boot16 \
      --dataset prepared --prepared_path $B/prep/eval_dp.npz \
      --kp_index_mode uniform --dphi_ckpt $B/dphi \
      --s2_noise_mode none --soft_anchor_clamp 1 \
      --pos_clip 1 --compare_oracle 1 --num_batches 8 --batch 64 \
      --sanity 1 --out_dir $R5/samples_uniform_boot16
  fi
fi

# ---- 2) serving saturation sweep (VERDICT #4). Throughput depends only on
# architecture shapes, so 400-step checkpoints at the exact bench.py dims
# (T=64 K=8 384d/12L) give the same samples/s as fully-trained ones —
# docs/SERVING.md will say so.
SV=runs/serving_r5
if has serving; then
  run_step sv_prep 1800 python -m \
    interpolated_diffusion_tpu.data.prepare_dp_keypoints \
    --out_path $SV/prep/dp.npz --T 64 --K 8 --num_samples 2000 \
    --store_kp_mask_levels 1 --levels 3
  if need $SV/prep/dp.npz; then
    run_step sv_kp 1800 python -m \
      interpolated_diffusion_tpu.train.train_keypoints \
      --dataset prepared --prepared_path $SV/prep/dp.npz --T 64 --K 8 \
      --idx_policy "uniform:1.0" --steps 400 --batch 256 --out_dir $SV/kp
    run_step sv_il 1800 python -m \
      interpolated_diffusion_tpu.train.train_interp_levels \
      --dataset prepared --prepared_path $SV/prep/dp.npz --T 64 \
      --K_min 8 --levels 3 --mode adj --anchor_conf 1 --anchor_conf_anneal 1 \
      --steps 400 --batch 256 --out_dir $SV/il
  fi
  if need $SV/kp $SV/il; then
    run_step serving_sweep_r5 3600 python scripts/bench_serving_sweep.py \
      --kp_ckpt $SV/kp --interp_ckpt $SV/il \
      --prepared_path $SV/prep/dp.npz \
      --out_json docs/serving_sweep_r5.json
  fi
fi

# ---- 3) on-chip component profile (VERDICT #5: decide the small-L line)
if has profile; then
  run_step profile_smallL 2400 python scripts/profile_pipeline.py
fi

# ---- 4) idx-policy-mix ablation (VERDICT #2). 8k steps/arm against the
# surviving r4 Stage-2.
if has idxmix; then
  if need $B/il $B/selector $B/dphi; then
    for MIX in "dp:1.0" "uniform:1.0" "selector:1.0" \
               "selector:0.7,uniform:0.2,random:0.1" \
               "dp:0.7,uniform:0.2,random:0.1"; do
      tag=$(echo "$MIX" | tr ':,.' '___')
      run_step "idxmix_r5_${tag}" 4200 env BASE=$B STEPS=${IDXMIX_STEPS:-8000} \
        MIXES="$MIX" bash scripts/pipelines/run_stage1_idxmix_ablation.sh
    done
  fi
fi

# ---- 5) wansynth_tiny staged pipeline (p1 600 -> anchors -> p2 600 -> eval)
WT=runs/wansynth_tiny
WT_DATA="--data tar --data_root $WT/data --num_samples 256 \
  --latent_c 8 --latent_h 16 --latent_w 16 --text_len 16 --text_dim 256"
WT_WAN="--use_wan 1 --wan_dim 256 --wan_layers 6 --wan_heads 4 --wan_ffn 1024 \
  --attn_mode dense --lora_rank 0 --use_remat 1 --layer_mode scan --bf16 1"
if has wansynth; then
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
fi

# ---- 6) maze quality refresh (stale docs/maze_quality_summary.json)
if has maze; then
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
fi

# ---- 7) gates
if has gates; then
  run_step bench_r5 2400 python bench.py
  run_step kernels_r5 2400 python scripts/verify_kernel_tpu.py
fi

echo "rundown r5b done: $SECTIONS $(date -Is)"
