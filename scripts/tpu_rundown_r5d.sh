#!/usr/bin/env bash
# Round-5 contingency arms for the Stage-2 refinement-sign contract
# (VERDICT r4 #1) — launch ONLY if the equal-budget boot16-10k grid +
# conf-override/smooth knob cells leave refined > interp collision at
# predicted dp best-of-16 anchors. Pick arms via args: boot90ft anchormatch
#
#   boot90ft    continue-train il_boot16@10k for +3k steps with
#               bootstrap_replace_prob 0.9 (warmup 1: full strength from
#               the first resumed step) — trains mostly on the test-time
#               anchor distribution; ~65 min.
#   anchormatch fresh 10k Stage-2 WITHOUT bootstrap but with anchor noise
#               matched to the MEASURED Stage-1 anchor error:
#               corrupt_anchor_frac 1.6 x sigma(levels)=0.02 -> 0.032 rms,
#               equal to the measured interior anchor error at dp
#               best-of-16 (docs/RESULTS.md round-5; cheap ~1h since no
#               bootstrap DDIM in the loss).
set -u
cd "$(dirname "$0")/.."
LOG=runs/tpu_rundown_r5
mkdir -p "$LOG"
. scripts/rundown_lib.sh

B=runs/d4rl_r4
R5=runs/d4rl_r5
SECTIONS=${*:-boot90ft}
has() { case " $SECTIONS " in *" $1 "*) return 0 ;; *) return 1 ;; esac; }

S2_TRAIN_COMMON="--dataset prepared --T 128 --use_sdf 1 --maze_h 12 --maze_w 9 \
  --prepared_path $B/prep/train_dp.npz \
  --K_min 8 --levels 8 --k_schedule geom --mode adj --mask_policy uniform \
  --anchor_conf 1 --anchor_conf_anneal 1 --w_anchor 0.1 \
  --corrupt_mode dist --corrupt_sigma_max 0.02 \
  --corrupt_sigma_min 0.003 --corrupt_sigma_pow 0.75 \
  --pos_clip 1 --batch 256"

SAMPLE_COMMON="--dataset prepared --prepared_path $B/prep/eval_dp.npz \
  --kp_index_mode uniform --dphi_ckpt $B/dphi \
  --stage1_best_of 16 --stage1_best_of_mode dp --stage1_cache_interval 2 \
  --s2_noise_mode none --soft_anchor_clamp 1 \
  --pos_clip 1 --compare_oracle 1 --num_batches 8 --batch 64 --sanity 1"

if has boot90ft; then
  if [ ! -d "$R5/il_boot90/ckpt_10000" ] && [ -d "$B/il_boot16/ckpt_10000" ]; then
    mkdir -p "$R5/il_boot90"
    cp -r "$B/il_boot16/ckpt_10000" "$R5/il_boot90/ckpt_10000"
  fi
  run_step boot90ft_train 7200 python -m \
    interpolated_diffusion_tpu.train.train_interp_levels \
    $S2_TRAIN_COMMON \
    --corrupt_anchor_frac 0.25 \
    --bootstrap_ckpt $B/kp --dphi_ckpt $B/dphi \
    --bootstrap_best_of 16 --bootstrap_best_of_mode dp \
    --bootstrap_ddim_steps 8 \
    --bootstrap_replace_prob 0.9 --bootstrap_warmup_steps 1 \
    --resume $R5/il_boot90 \
    --steps 13000 --out_dir $R5/il_boot90
  if need $R5/il_boot90/ckpt_13000; then
    run_step boot90ft_b16sc 3600 python -m \
      interpolated_diffusion_tpu.sample.generate \
      --kp_ckpt $B/kp --interp_ckpt $R5/il_boot90 $SAMPLE_COMMON \
      --out_dir $R5/samples_boot90_b16sc
    run_step boot90ft_b16sc_conf05 3600 python -m \
      interpolated_diffusion_tpu.sample.generate \
      --kp_ckpt $B/kp --interp_ckpt $R5/il_boot90 $SAMPLE_COMMON \
      --anchor_conf_override 0.5 \
      --out_dir $R5/samples_boot90_b16sc_conf05
  fi
fi

if has anchormatch; then
  run_step anchormatch_train 7200 python -m \
    interpolated_diffusion_tpu.train.train_interp_levels \
    $S2_TRAIN_COMMON \
    --corrupt_anchor_frac 1.6 \
    --steps 10000 --out_dir $R5/il_am
  if need $R5/il_am/ckpt_10000; then
    run_step anchormatch_b16sc 3600 python -m \
      interpolated_diffusion_tpu.sample.generate \
      --kp_ckpt $B/kp --interp_ckpt $R5/il_am $SAMPLE_COMMON \
      --out_dir $R5/samples_am_b16sc
  fi
fi

echo "rundown r5d done: $SECTIONS $(date -Is)"
