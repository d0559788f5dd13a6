#!/bin/bash
# Watch for the axon TPU grant to return; the moment a probe succeeds,
# run the real bench (which persists BENCH_LAST_GOOD.json) and exit.
# Probes use SIGTERM timeouts (never SIGKILL a TPU-attached process —
# round-1 lesson: hard-killed holders wedged the grant pool).
cd /root/repo
LOG=/tmp/tpu_watch.log
echo "[tpu_watch] start $(date -u +%FT%TZ)" >> "$LOG"
for i in $(seq 1 70); do
  if timeout 150 python -c "
import jax, numpy as np, jax.numpy as jnp
d = jax.devices()
x = jnp.ones((128, 128))
assert float(np.asarray(x @ x)[0, 0]) == 128.0
print('TPU alive:', d[0])
" >> "$LOG" 2>&1; then
    echo "[tpu_watch] TPU alive at $(date -u +%FT%TZ); running bench" >> "$LOG"
    python bench.py >> "$LOG" 2>&1
    echo "[tpu_watch] bench done rc=$? $(date -u +%FT%TZ)" >> "$LOG"
    exit 0
  fi
  echo "[tpu_watch] probe $i failed $(date -u +%FT%TZ)" >> "$LOG"
  sleep 540
done
echo "[tpu_watch] gave up after 70 probes" >> "$LOG"
exit 1
