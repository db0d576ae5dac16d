#!/bin/bash
# Poll the axon TPU tunnel until it answers; log status lines to /tmp/tpu_probe.log.
# jax.devices() hangs in-process when the tunnel is dead -> always probe in a
# fresh subprocess under timeout.
LOG=/tmp/tpu_probe.log
: > "$LOG"
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
  else
    echo "$ts DEAD rc=$rc ${out:0:120}" >> "$LOG"
  fi
  sleep 180
done
