#!/usr/bin/env bash
# wansynth_tiny v2: same staged chain as r5i but with Phase-1 trained 5x
# longer (3000 steps). v1 (runs/wansynth_tiny, committed in
# docs/results/wansynth_tiny__eval_stage2/) showed Phase-1 anchor quality is
# the binding constraint (anchor MSE 1253 at 600 steps, DDIM-4 divergence on
# the undertrained eps-model); this measures how far the anchor knob alone
# moves the chain. Runs after the maze_q10k chain frees the chip.
set -u
cd "$(dirname "$0")/.."
LOG=runs/tpu_rundown_r5
mkdir -p "$LOG"
. scripts/rundown_lib.sh

WT=runs/wansynth_tiny2
WT_DATA="--data tar --data_root runs/wansynth_tiny/data --num_samples 256 \
  --latent_c 8 --latent_h 16 --latent_w 16 --text_len 16 --text_dim 256"
WT_WAN="--use_wan 1 --wan_dim 256 --wan_layers 6 --wan_heads 4 --wan_ffn 1024 \
  --attn_mode dense --lora_rank 0 --use_remat 1 --layer_mode scan --bf16 1"

if need runs/wansynth_tiny/data; then
  run_step wt2_p1 3000 python -m \
    interpolated_diffusion_tpu.train.train_keypoints_wansynth \
    $WT_DATA $WT_WAN --T 21 --K 5 \
    --phase1_input_mode short_anchors --frame_cond 1 --cond_drop_prob 0.1 \
    --batch 2 --grad_accum 2 --steps 3000 --save_every 3000 --out_dir $WT/p1
fi
if need $WT/p1/ckpt_3000; then
  run_step wt2_anchors 2400 python -m \
    interpolated_diffusion_tpu.data.precompute_phase1_anchors \
    --ckpt $WT/p1/ckpt_3000 --out_root $WT/anchors \
    --data tar --data_root runs/wansynth_tiny/data --batch 2 --ddim_steps 4
fi
if compgen -G "$WT/anchors/*.tar" > /dev/null; then
  run_step wt2_p2 3000 python -m \
    interpolated_diffusion_tpu.train.train_interp_levels_wansynth \
    $WT_DATA $WT_WAN --T 21 --K_min 5 --levels 2 --mode adj \
    --anchors_root $WT/anchors \
    --batch 2 --grad_accum 2 --steps 1200 --save_every 1200 --out_dir $WT/p2
fi
if need $WT/p2/ckpt_1200; then
  run_step wt2_eval 1800 python -m \
    interpolated_diffusion_tpu.diagnostics.eval_wansynth_stage2 \
    --p2_ckpt $WT/p2/ckpt_1200 --p1_ckpt $WT/p1/ckpt_3000 \
    --data tar --data_root runs/wansynth_tiny/data --anchors_root $WT/anchors \
    --batch 2 --num_batches 16 --out_dir $WT/eval_stage2
fi
echo "rundown r5k done $(date -Is)"
