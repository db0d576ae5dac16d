#!/bin/bash
# Poll the axon TPU tunnel; log status to /tmp/tpu_probe.log. The moment the
# tunnel answers, OPPORTUNISTICALLY capture the full bench (backend selection,
# suite rows, scaling) to /tmp/bench_tpu_live_<ts>.json — the tunnel has been
# flaky for whole rounds, so a revival window must be harvested immediately,
# not discovered later.
# jax.devices() hangs in-process when the tunnel is dead -> always probe in a
# fresh subprocess under timeout.
LOG=/tmp/tpu_probe.log
HARVESTS=0
MAX_HARVESTS=2   # after that, probe-only: never contend with the
                 # driver's own end-of-round bench on the single chip
while true; do
  ts=$(date +%H:%M:%S)
  out=$(timeout 90 python - <<'EOF' 2>&1
import jax
ds = jax.devices()
import jax.numpy as jnp
x = jnp.ones((256, 256))
jnp.asarray((x @ x).sum()).block_until_ready()
print("OK", [d.platform for d in ds])
EOF
)
  rc=$?
  if [ $rc -eq 0 ] && echo "$out" | grep -q "OK.*tpu"; then
    echo "$ts ALIVE $out" >> "$LOG"
    if [ "$HARVESTS" -ge "$MAX_HARVESTS" ]; then
      sleep 600
      continue
    fi
    HARVESTS=$((HARVESTS + 1))
    stamp=$(date +%Y%m%d_%H%M%S)
    echo "$ts HARVEST starting bench -> /tmp/bench_tpu_live_$stamp.json" >> "$LOG"
    (cd /root/repo && timeout 2700 python tools/tpu_microbench.py --no-pallas intel dlr \
        > "/tmp/microbench_tpu_$stamp.json" \
        2> "/tmp/microbench_tpu_$stamp.err")
    echo "$(date +%H:%M:%S) MICROBENCH done rc=$? ($stamp)" >> "$LOG"
    for be in banded-direct banded-cr banded-mixed banded-pallas; do
      (cd /root/repo && timeout 600 python tools/tpu_profile.py \
          --backend "$be" intel \
          > "/tmp/profile_tpu_${be}_$stamp.txt" 2>&1)
    done
    echo "$(date +%H:%M:%S) PROFILES done ($stamp)" >> "$LOG"
    (cd /root/repo && timeout 2400 python bench.py \
        > "/tmp/bench_tpu_live_$stamp.json" \
        2> "/tmp/bench_tpu_live_$stamp.err")
    echo "$(date +%H:%M:%S) HARVEST done rc=$? ($stamp)" >> "$LOG"
    sleep 600
  else
    echo "$ts DEAD rc=$rc ${out:0:120}" >> "$LOG"
    sleep 180
  fi
done
