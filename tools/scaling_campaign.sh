#!/bin/bash
# Gated scaling-measurement campaign (the protocol behind BASELINE.md's
# accepted pairs): wait for a quiet window (1-min load < 0.9 AND a 20 s
# steal probe < 1.5% of host capacity), run `bench.py --scaling` with
# the spawn-amortized x16 workload, and ACCEPT a sample only when BOTH
# parallelism levels' in-run steal (steal_pct_4/16, recorded by
# bench.py itself) are under 3%. Every sample is appended to the log so
# discarded windows stay auditable. Acceptance rule fixed up front —
# no best-of-N selection.
#
# Usage: bash tools/scaling_campaign.sh [max_attempts]   (default 6)
#
# SCALE_REPEAT (default 16) sets the per-level workload multiplier.
# The north rule's criterion models a LONG job on two cluster sizes,
# where per-job fixed cost (ray.init + actor-pool spawn, ~1-2 s) is
# negligible; in this sandbox the wide level's window is short enough
# that the fixed cost alone eats ~4% apparent efficiency at x16. A
# larger repeat is therefore the MORE faithful stand-in — the trade is
# longer exposure to foreign-load spikes, which the per-level in-run
# steal gate already rejects.
LOG=${SCALING_CAMPAIGN_LOG:-/tmp/scaling_campaign.jsonl}
SCALE_REPEAT=${SCALE_REPEAT:-16}
for attempt in $(seq 1 "${1:-6}"); do
  while true; do
    L=$(awk '{print $1}' /proc/loadavg)
    s0=$(awk '{print $9; exit}' /proc/stat); sleep 20
    s1=$(awk '{print $9; exit}' /proc/stat)
    # cpu count from /proc/stat, not nproc: the sandbox shell's CPU
    # affinity can be restricted (nproc=1), which would inflate the
    # probe 32x and make the quiet-window gate unpassable
    C=$(grep -c '^cpu[0-9]' /proc/stat)
    SP=$(awk -v d=$((s1-s0)) -v c="$C" 'BEGIN{printf "%.1f", 100*d/(20*100*c)}')
    ok=$(awk -v l="$L" -v s="$SP" 'BEGIN{print (l<0.9 && s<1.5)?1:0}')
    [ "$ok" = "1" ] && break
    sleep 40
  done
  BENCH_SCALE_REPEAT=$SCALE_REPEAT python3 "$(dirname "$0")/../bench.py" --scaling \
    > /tmp/scal_attempt.json 2>/dev/null
  cat /tmp/scal_attempt.json >> "$LOG"; echo >> "$LOG"
  CLEAN=$(python3 - <<'PY'
import json
d = json.load(open("/tmp/scal_attempt.json"))
s4, s16 = d.get("steal_pct_4"), d.get("steal_pct_16")
print(1 if (s4 is not None and s16 is not None and s4 < 3 and s16 < 3) else 0)
PY
)
  if [ "$CLEAN" = "1" ]; then echo "CLEAN SAMPLE on attempt $attempt" >> "$LOG"; break; fi
done
echo DONE >> "$LOG"
