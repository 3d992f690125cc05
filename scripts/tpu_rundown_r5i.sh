#!/usr/bin/env bash
# Final round-5 session: the wansynth_tiny staged pipeline at trained scale
# (VERDICT r4 #3 — the video-path analogue of the reference's
# train_interp_levels_wansynth.py:452-529, trained rather than smoked).
# The d4rl-based items (idxmix 20k, smooth_weight sweep) need the ~2h
# unified rebuild and do not fit this session's budget; this does.
set -u
cd "$(dirname "$0")/.."
LOG=runs/tpu_rundown_r5
mkdir -p "$LOG"
. scripts/rundown_lib.sh

WT=runs/wansynth_tiny
WT_DATA="--data tar --data_root $WT/data --num_samples 256 \
  --latent_c 8 --latent_h 16 --latent_w 16 --text_len 16 --text_dim 256"
WT_WAN="--use_wan 1 --wan_dim 256 --wan_layers 6 --wan_heads 4 --wan_ffn 1024 \
  --attn_mode dense --lora_rank 0 --use_remat 1 --layer_mode scan --bf16 1"

run_step wt_data 1200 python -m interpolated_diffusion_tpu.data.make_synth_tars \
  --out_root $WT/data --num_samples 256 --T 21 \
  --latent_c 8 --latent_h 16 --latent_w 16 --text_len 16 --text_dim 256
if need $WT/data; then
  run_step wt_p1 3000 python -m \
    interpolated_diffusion_tpu.train.train_keypoints_wansynth \
    $WT_DATA $WT_WAN --T 21 --K 5 \
    --phase1_input_mode short_anchors --frame_cond 1 --cond_drop_prob 0.1 \
    --batch 2 --grad_accum 2 --steps 600 --save_every 600 --out_dir $WT/p1
fi
if need $WT/p1/ckpt_600; then
  run_step wt_anchors 2400 python -m \
    interpolated_diffusion_tpu.data.precompute_phase1_anchors \
    --ckpt $WT/p1/ckpt_600 --out_root $WT/anchors \
    --data tar --data_root $WT/data --batch 2 --ddim_steps 4
fi
if compgen -G "$WT/anchors/*.tar" > /dev/null; then
  run_step wt_p2 3000 python -m \
    interpolated_diffusion_tpu.train.train_interp_levels_wansynth \
    $WT_DATA $WT_WAN --T 21 --K_min 5 --levels 2 --mode adj \
    --anchors_root $WT/anchors \
    --batch 2 --grad_accum 2 --steps 600 --save_every 600 --out_dir $WT/p2
fi
if need $WT/p2/ckpt_600; then
  run_step wt_eval 1800 python -m \
    interpolated_diffusion_tpu.diagnostics.eval_wansynth_stage2 \
    --p2_ckpt $WT/p2/ckpt_600 --p1_ckpt $WT/p1/ckpt_600 \
    --data tar --data_root $WT/data --anchors_root $WT/anchors \
    --batch 2 --num_batches 16 --out_dir $WT/eval_stage2
fi
echo "rundown r5i done $(date -Is)"
