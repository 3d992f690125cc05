#!/usr/bin/env bash
# Wait for the axon TPU chip claim to free, then run the round's TPU work
# queue (scripts/tpu_rundown.sh). The claim can stay wedged for hours after
# a crashed session (see docs/PARITY.md); this loop probes with a bounded
# timeout so each probe's own claim releases cleanly, and fires the rundown
# on the first successful device enumeration.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_rundown_driver.log}
PROBE_TIMEOUT=${PROBE_TIMEOUT:-300}
SLEEP=${SLEEP:-600}

i=0
while :; do
  i=$((i + 1))
  echo "probe $i at $(date)" >> "$LOG"
  if timeout "$PROBE_TIMEOUT" python -c \
      "import jax; d = jax.devices(); assert d; print(d)" >> "$LOG" 2>&1; then
    echo "chip free at $(date) — starting rundown" >> "$LOG"
    bash scripts/tpu_rundown.sh >> "$LOG" 2>&1
    echo "rundown finished rc=$? at $(date)" >> "$LOG"
    exit 0
  fi
  sleep "$SLEEP"
done
