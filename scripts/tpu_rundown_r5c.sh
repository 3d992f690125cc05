#!/usr/bin/env bash
# Round-5 follow-on cells: the zero-training-cost arms targeting the two
# open Stage-2 contract items (VERDICT r4 #1) on the finished 10k boot16
# checkpoint —
#   * refined <= interp collision at predicted dp best-of-16 anchors:
#     --anchor_conf_override 0.5 closes the train/test conf mismatch
#     (bootstrap training labeled real student anchors 0.5; sampling
#     presented them at teacher 0.95, understating anchor error);
#   * refined smoothness <= 2x interp: --s2_delta_smooth N low-passes the
#     iid per-frame delta texture at missing frames only.
# Cells isolate each knob and compose them; one il-control cell checks the
# smoothing knob without the bootstrap retrain.
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

if need $B/il_boot16/ckpt_10000; then
  run_step r5_b16sc_conf05 3600 python -m \
    interpolated_diffusion_tpu.sample.generate \
    --kp_ckpt $B/kp --interp_ckpt $B/il_boot16 $SAMPLE_COMMON \
    --anchor_conf_override 0.5 \
    --out_dir $R5/samples_b16sc_conf05
  run_step r5_b16sc_conf05_smooth2 3600 python -m \
    interpolated_diffusion_tpu.sample.generate \
    --kp_ckpt $B/kp --interp_ckpt $B/il_boot16 $SAMPLE_COMMON \
    --anchor_conf_override 0.5 --s2_delta_smooth 2 \
    --out_dir $R5/samples_b16sc_conf05_smooth2
  run_step r5_b16sc_smooth2 3600 python -m \
    interpolated_diffusion_tpu.sample.generate \
    --kp_ckpt $B/kp --interp_ckpt $B/il_boot16 $SAMPLE_COMMON \
    --s2_delta_smooth 2 \
    --out_dir $R5/samples_b16sc_smooth2
fi
# il control: smoothing alone on the original Stage-2
run_step r5_ilsc_smooth2 3600 python -m \
  interpolated_diffusion_tpu.sample.generate \
  --kp_ckpt $B/kp --interp_ckpt $B/il $SAMPLE_COMMON \
  --s2_delta_smooth 2 \
  --out_dir $R5/samples_ilsc_smooth2

# ---- int8 SageSLA value point on the anchor-precompute path (VERDICT r4
# #9): the int8 kernel is train-neutral but the reference's SageSLA earned
# its 2.6x on inference-only anchor precompute (PROJECT_LOG.md:627-629).
# A/B sla vs sage_sla at the real workload shape: K=5 anchor frames x
# 30x52 patches = 7800 tokens, DDIM-4. Throughput lands in each run's
# prep_config.json (samples_per_sec, steady-state).
IP=runs/int8_precompute_r5
run_step ip_ckpt 2400 python -m \
  interpolated_diffusion_tpu.train.train_keypoints_wansynth \
  --data synthetic --num_samples 8 --T 21 --K 5 \
  --latent_c 16 --latent_h 60 --latent_w 104 --text_len 16 --text_dim 512 \
  --use_wan 1 --wan_dim 384 --wan_layers 4 --wan_heads 6 --wan_ffn 1536 \
  --attn_mode sla --sla_topk 0.1 --lora_rank 0 --use_remat 1 \
  --layer_mode scan --bf16 1 --phase1_input_mode short_anchors \
  --batch 1 --steps 2 --save_every 2 --out_dir $IP/ckpt
if need $IP/ckpt/ckpt_2; then
  for MODE in sla sage_sla; do
    run_step ip_ab_$MODE 2400 python -m \
      interpolated_diffusion_tpu.data.precompute_phase1_anchors \
      --ckpt $IP/ckpt --out_root $IP/anchors_$MODE --data synthetic \
      --num_samples 24 --batch 2 --ddim_steps 4 --attn_mode $MODE
  done
fi

echo "rundown r5c done $(date -Is)"
