# Shared rundown helpers (sourced by scripts/tpu_rundown_r5*.sh).
#
# Marker honesty (VERDICT r4 weak #1 / next #7): a `.done` marker is only
# trusted when it records a real completion — run_step writes rc, start/end
# timestamps, and the log path INTO the marker and refuses to honor an
# empty marker left by a hand `touch`. Deliberate triage cuts must use
# `cut_step <name> "<reason>"`, which writes an explicit `.cut` marker the
# summaries can report as "cut: <reason>" instead of silently "done".
# $LOG must be set by the sourcing script before calling run_step.

run_step() {
  local name=$1 tmo=$2; shift 2
  local marker="$LOG/$name.done"
  if [ -f "$LOG/$name.cut" ]; then
    echo "== $name: CUT ($(cat "$LOG/$name.cut"))"; return 0
  fi
  if [ -s "$marker" ] && grep -q '^rc=0' "$marker"; then
    echo "== $name: already done"; return 0
  fi
  if [ -f "$marker" ]; then
    echo "== $name: stale/empty marker (hand-touched?) — rerunning"
    rm -f "$marker"
  fi
  local t0; t0=$(date -Is)
  echo "== $name: start $t0"
  if timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1; then
    {
      echo "rc=0"
      echo "start=$t0"
      echo "end=$(date -Is)"
      echo "log=$LOG/$name.log"
      echo "cmd=$*"
    } > "$marker"
    echo "== $name: OK $(date -Is)"; return 0
  else
    local rc=$?
    echo "== $name: FAILED rc=$rc (see $LOG/$name.log)"
    {
      echo "rc=$rc"
      echo "start=$t0"
      echo "end=$(date -Is)"
      echo "log=$LOG/$name.log"
    } > "$LOG/$name.failed"
    return "$rc"
  fi
}

cut_step() {
  local name=$1 reason=$2
  echo "$reason" > "$LOG/$name.cut"
  echo "== $name: cut ($reason)"
}

need() {
  local p; for p in "$@"; do
    [ -e "$p" ] || { echo "== SKIP (missing prerequisite: $p)"; return 1; }
  done
}
