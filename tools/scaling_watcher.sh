#!/bin/bash
# Watch host memory bandwidth; when two consecutive probes 10s apart both
# read >= 1 GB/s, fire a 3-run `bench.py --scaling` block (the round-3
# verdict's "clean block" criterion: every bracketing probe healthy).
# Only the FINAL JSON line of each bench run is appended to
# /tmp/scaling_clean.jsonl (full stdout goes to /tmp/scaling_run_$i.log) so
# stray non-JSON output can never corrupt the jsonl.  A probe failure yields
# "0" instead of feeding a traceback into float().
cd /root/repo
# best of three consecutive copies: the first copy after idle under-reads
# on a healthy host (cold-core ramp + first-touch faults) — single-copy
# probes misread rounds 3-4 as continuously throttled
probe() {
  python - <<'EOF' 2>/dev/null || echo 0
import numpy as np, time
best = 0.0
for _ in range(3):
    a = np.ones(200*1024*1024//8)
    t0=time.time(); b=a.copy(); dt=time.time()-t0
    best = max(best, 200/1024/dt)
print(f"{best:.3f}")
EOF
}
while true; do
  p1=$(probe | tail -1)
  echo "$(date +%H:%M:%S) probe1=$p1 GB/s"
  if python -c "exit(0 if float('${p1:-0}')>=1.0 else 1)" 2>/dev/null; then
    sleep 10
    p2=$(probe | tail -1)
    echo "$(date +%H:%M:%S) probe2=$p2 GB/s"
    if python -c "exit(0 if float('${p2:-0}')>=1.0 else 1)" 2>/dev/null; then
      echo "$(date +%H:%M:%S) HEALTHY WINDOW — firing 3-run scaling block"
      for i in 1 2 3; do
        python bench.py --scaling > /tmp/scaling_run_$i.log 2>/tmp/scaling_err_$i.log
        if tail -1 /tmp/scaling_run_$i.log | python -c "import json,sys; json.loads(sys.stdin.read())" 2>/dev/null; then
          tail -1 /tmp/scaling_run_$i.log >> /tmp/scaling_clean.jsonl
          echo "$(date +%H:%M:%S) run $i done: $(tail -1 /tmp/scaling_clean.jsonl | head -c 400)"
        else
          echo "$(date +%H:%M:%S) run $i FAILED (no JSON tail; see /tmp/scaling_err_$i.log)"
        fi
      done
      echo "BLOCK COMPLETE — check /tmp/scaling_clean.jsonl"
      # keep watching: more clean blocks never hurt
    fi
  fi
  sleep 120
done
