#!/bin/bash
# Probe the axon TPU tunnel every 3 min; log health to tunnel_health.log
LOG=/root/repo/results/diag/tunnel_health.log
while true; do
  START=$(date +%s)
  timeout 150 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.asarray(np.ones((4,4)))
print('HEALTHY', float(np.asarray(x).sum()))
" > /tmp/tunnel_probe_out 2>&1
  RC=$?
  END=$(date +%s)
  if grep -q HEALTHY /tmp/tunnel_probe_out; then
    echo "$(date +%F\ %T) HEALTHY ($((END-START))s)" >> "$LOG"
  else
    echo "$(date +%F\ %T) DOWN rc=$RC ($((END-START))s)" >> "$LOG"
  fi
  sleep 180
done
