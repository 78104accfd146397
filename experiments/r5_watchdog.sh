#!/bin/bash
# TPU-recovery watchdog for the round-5 queue. After the 22:00 VM restart
# the axon backend enumerates but never executes (tiny matmul hangs), so
# the queue cannot start. Probe the device with a 180 s-bounded trivial
# program every 5 min; when a probe round-trips, fire r5b_queue.sh once.
# Also guards the queue against the r4 transport-hang failure mode: if the
# queue's current stage log goes silent AND the training JSON stops
# growing for 20 min, kill the queue's process group and relaunch it
# (stages are idempotent: preprocess skips done files, training restarts).
set -u
cd /root/repo
PY=/opt/venv/bin/python
R5=experiments/r5
mkdir -p $R5
log() { echo "[watchdog $(date -u +%H:%M:%S)] $*" >> $R5/watchdog.log; }

# Empirics (watchdog.log + this session's probes): a CLEAN client exit
# releases the device within seconds-to-minutes, but a KILLED client (incl.
# a timed-out probe) wedges the backend for several minutes, and each
# subsequent kill extends the wedge. So probe with a long leash (the device
# can legitimately take ~60 s on first touch), and back off hard after a
# probe that had to be killed.
probe() {
  timeout 420 $PY -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((256, 256), jnp.bfloat16)
assert float(np.asarray((x @ x).sum())) > 0
" > /dev/null 2>&1
}

queue_alive() {
  [ -f /tmp/r5b.pid ] && kill -0 "$(cat /tmp/r5b.pid)" 2>/dev/null
}

fire_queue() {
  setsid nohup bash experiments/r5b_queue.sh >> experiments/r5_stdout.log 2>&1 &
  echo $! > /tmp/r5b.pid
  log "queue fired, pid $(cat /tmp/r5b.pid)"
}

# Snapshot of "is the queue making progress": newest mtime among the
# stage logs + training JSONs it writes.
progress_stamp() {
  find $R5 experiments/out_gen -maxdepth 2 \
       -name "*.log" -o -name "training_log_*.json" 2>/dev/null \
    | xargs -r stat -c %Y 2>/dev/null | sort -n | tail -1
}

log "watchdog started"
SILENT=0
while true; do
  if grep -q "DONE r5 perf queue" $R5/queue.log 2>/dev/null; then
    log "queue complete; watchdog exiting"
    exit 0
  fi
  if queue_alive; then
    NOW=$(date +%s); LAST=$(progress_stamp); LAST=${LAST:-0}
    if [ $((NOW - LAST)) -gt 1200 ]; then
      SILENT=$((SILENT + 1))
      log "no progress for $((NOW - LAST)) s (strike $SILENT)"
      if [ $SILENT -ge 2 ] && probe; then
        # Device answers but the queue is stuck -> hung transport in the
        # stage process. Kill the queue's process group, relaunch.
        QPID=$(cat /tmp/r5b.pid)
        log "device healthy but queue hung; killing pgid $QPID"
        kill -- -"$QPID" 2>/dev/null; sleep 5
        kill -9 -- -"$QPID" 2>/dev/null; sleep 2
        fire_queue; SILENT=0
      fi
    else
      SILENT=0
    fi
  else
    if probe; then
      log "TPU probe OK; (re)starting queue"
      fire_queue
    else
      log "TPU probe failed/hung; backing off 10 min (killed probes wedge the device)"
      sleep 300
    fi
  fi
  sleep 300
done
