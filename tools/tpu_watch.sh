#!/bin/bash
# TPU-recovery watcher v2 (round-3/4 long-outage operating pattern, CLAUDE.md).
# Probes the axon tunnel every 10 min; when alive, drains the job queue at
# tools/tpu_queue.d/*.sh IN ORDER (one TPU job at a time — Mosaic compiles
# contend server-side). Finished jobs move to tools/tpu_queue.d/done/.
# v2: a job that fails (e.g. the tunnel died mid-run) is requeued up to two
# times as <name>.retryN.sh (sorts into the same queue position) before
# landing in failed/ — a mid-bench tunnel drop must not permanently skip
# the driver-verification run. New jobs can be added while the watcher runs.
# Logs to /root/repo/tpu_watch.log. PID in /tmp/tpu_watch.pid.
set -u
cd /root/repo
LOG=/root/repo/tpu_watch.log
QD=/root/repo/tools/tpu_queue.d
mkdir -p "$QD/done" "$QD/failed"
echo "[watch] v2 start $(date -u +%FT%TZ)" >> "$LOG"
while true; do
  jobs=("$QD"/*.sh)
  if [ ! -e "${jobs[0]}" ]; then
    echo "[watch] queue empty; exiting $(date -u +%FT%TZ)" >> "$LOG"
    exit 0
  fi
  if timeout 300 python - >> "$LOG" 2>&1 <<'EOF'
import jax, jax.numpy as jnp
d = jax.devices()
x = float(jnp.sum(jnp.ones((8, 128))))
assert x == 1024.0
print("[watch] probe OK:", d)
EOF
  then
    for job in "$QD"/*.sh; do
      [ -e "$job" ] || break
      echo "[watch] running $job $(date -u +%FT%TZ)" >> "$LOG"
      bash "$job" >> "$LOG" 2>&1
      rc=$?
      echo "[watch] $job rc=$rc $(date -u +%FT%TZ)" >> "$LOG"
      if [ $rc -eq 0 ]; then
        mv "$job" "$QD/done/"
      else
        base=$(basename "$job" .sh)
        n=0
        if [[ "$base" =~ ^(.*)\.retry([0-9]+)$ ]]; then
          base="${BASH_REMATCH[1]}"; n="${BASH_REMATCH[2]}"
        fi
        if [ "$n" -lt 2 ]; then
          mv "$job" "$QD/$base.retry$((n + 1)).sh"
          echo "[watch] requeued as $base.retry$((n + 1)).sh" >> "$LOG"
        else
          mv "$job" "$QD/failed/$base.sh"
          echo "[watch] giving up on $base after $n retries" >> "$LOG"
        fi
        break   # re-probe before continuing (tunnel may have died mid-job)
      fi
    done
  else
    echo "[watch] probe dead $(date -u +%FT%TZ)" >> "$LOG"
  fi
  sleep 600
done
