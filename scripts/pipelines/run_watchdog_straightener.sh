#!/usr/bin/env bash
# Long-running latent-straightener training under the crash-restart watchdog
# (parity with reference scripts/run_watchdog_straightener.sh +
# watchdog_train.py): the watchdog restarts the trainer with --resume pointed
# at the newest checkpoint if the process dies.
set -euo pipefail
cd "$(dirname "$0")/../.."

OUT=${OUT:-runs/straightener}
STEPS=${STEPS:-10000}
ARCH=${ARCH:-token}

python scripts/watchdog_train.py --out_dir "$OUT" \
  --max_restarts "${MAX_RESTARTS:-20}" -- \
  python -m interpolated_diffusion_tpu.train.train_latent_straightener_wansynth \
  --arch "$ARCH" --steps "$STEPS" --batch "${BATCH:-8}" \
  --num_samples "${NUM_SAMPLES:-1000}" --out_dir "$OUT"
