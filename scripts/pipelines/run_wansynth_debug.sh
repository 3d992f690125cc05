#!/usr/bin/env bash
# Wansynth smoke pipeline: every stage for a couple of steps at tiny sizes
# (parity with reference scripts/run_wansynth_pipeline_debug.sh — the e2e
# smoke test).
set -euo pipefail
cd "$(dirname "$0")/../.."
OUT=${OUT:-runs/wansynth_debug}
TINY="--num_samples 16 --T 9 --latent_c 4 --latent_h 8 --latent_w 8 \
  --text_len 8 --text_dim 64 --wan_dim 64 --wan_layers 2 --wan_heads 2 \
  --wan_ffn 128 --attn_mode dense --use_remat 0 --batch 2 --steps 2 \
  --save_every 2 --log_every 1 --bf16 0"

python -m interpolated_diffusion_tpu.train.train_keypoints_wansynth \
  $TINY --K 3 --N_train 20 --phase1_input_mode short_anchors --lora_rank 2 \
  --out_dir "$OUT/p1"
python -m interpolated_diffusion_tpu.data.precompute_phase1_anchors \
  --ckpt "$OUT/p1/ckpt_2" --out_root "$OUT/anchors" --num_samples 8 \
  --batch 4 --ddim_steps 2 --bf16 0
python -m interpolated_diffusion_tpu.train.train_interp_levels_wansynth \
  $TINY --K_min 3 --levels 2 --mode adj --lora_rank 2 --out_dir "$OUT/p2"
python -m interpolated_diffusion_tpu.train.train_flow_interpolator_wansynth \
  --num_samples 16 --T 9 --latent_c 4 --latent_h 8 --latent_w 8 \
  --text_len 4 --text_dim 16 --base_channels 8 --residual_blocks 1 \
  --batch 2 --steps 2 --save_every 2 --log_every 1 --bf16 0 \
  --out_dir "$OUT/flow"
python -m interpolated_diffusion_tpu.diagnostics.eval_interpolators \
  --interpolator flow --ckpt "$OUT/flow/ckpt_2" --T 9 --K 3 \
  --latent_c 4 --latent_h 8 --latent_w 8 --batch 2 --num_batches 2
echo "wansynth debug pipeline OK"
