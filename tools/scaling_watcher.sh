#!/bin/bash
# Watch host memory bandwidth; when two consecutive probes 10s apart both
# read >= 1 GB/s, fire a 3-run `bench.py --scaling` block (the round-3
# verdict's "clean block" criterion: every bracketing probe healthy).
# Results append to /tmp/scaling_clean.jsonl; watcher log to stdout.
cd /root/repo
probe() {
  python - <<'EOF'
import numpy as np, time
a = np.ones(200*1024*1024//8)
t0=time.time(); b=a.copy(); dt=time.time()-t0
print(f"{200/1024/dt:.3f}")
EOF
}
while true; do
  p1=$(probe)
  echo "$(date +%H:%M:%S) probe1=$p1 GB/s"
  if python -c "exit(0 if float('$p1')>=1.0 else 1)"; then
    sleep 10
    p2=$(probe)
    echo "$(date +%H:%M:%S) probe2=$p2 GB/s"
    if python -c "exit(0 if float('$p2')>=1.0 else 1)"; then
      echo "$(date +%H:%M:%S) HEALTHY WINDOW — firing 3-run scaling block"
      for i in 1 2 3; do
        python bench.py --scaling >> /tmp/scaling_clean.jsonl 2>/tmp/scaling_err_$i.log
        echo "$(date +%H:%M:%S) run $i done: $(tail -1 /tmp/scaling_clean.jsonl | head -c 400)"
      done
      echo "BLOCK COMPLETE — check /tmp/scaling_clean.jsonl"
      # keep watching: more clean blocks never hurt
    fi
  fi
  sleep 120
done
