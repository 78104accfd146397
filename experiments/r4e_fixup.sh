#!/bin/bash
# Follow-up watcher for r4d: the r4d serve-CLI stage passes --data $OUT/np
# but cli.serve expects the band-dir root ($OUT/np/midi — serve.py:107 joins
# data/<composer>). Editing a running bash script shifts its read offset, so
# instead this watcher waits for the r4d DONE marker and re-runs the serve
# smoke with the corrected path (plus a mamba serve point if the mamba
# retrain stage landed a checkpoint).
set -u
cd /root/repo
OUT=experiments/out_gen
R4=experiments/r4
PY=/opt/venv/bin/python
export JAX_COMPILATION_CACHE_DIR=/root/repo/experiments/.jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

for i in $(seq 1 480); do
  grep -q "DONE r4d" $R4/queue.log 2>/dev/null && break
  sleep 30
done
grep -q "DONE r4d" $R4/queue.log 2>/dev/null || exit 1

REQS='[{"composer":"Bach","length":2000},{"composer":"Mozart","length":500},{"composer":"Chopin","length":1000},{"composer":"Beethoven","length":250},{"composer":"Bach","length":1500},{"composer":"Mozart","length":750},{"composer":"Chopin","length":2000},{"composer":"Beethoven","length":400}]'

echo "=== R4E STAGE serve CLI smoke RETRY (corrected --data) $(date -u +%H:%M:%S) ===" | tee -a $R4/queue.log
CKPT=$(ls -dt $OUT/ckpt/transformer/loss_* 2>/dev/null | head -1)
if [ -n "$CKPT" ]; then
  timeout 1800 $PY -m musicgen_tpu.cli.serve --model transformer \
      --ckpt "$CKPT" --data $OUT/np/midi --metadata $OUT/metadata.json \
      --requests "$REQS" --output $OUT/serve/cli \
      --stats $R4/serve_cli_stats.json > $R4/serve_cli.log 2>&1
  echo "rc=$? $(date -u +%H:%M:%S)" | tee -a $R4/queue.log
fi

MCKPT=$(ls -dt $OUT/ckpt/mamba/loss_* 2>/dev/null | head -1)
if [ -n "$MCKPT" ]; then
  echo "=== R4E STAGE serve CLI smoke (trained mamba) $(date -u +%H:%M:%S) ===" | tee -a $R4/queue.log
  timeout 1800 $PY -m musicgen_tpu.cli.serve --model mamba \
      --ckpt "$MCKPT" --data $OUT/np/midi --metadata $OUT/metadata.json \
      --requests "$REQS" --output $OUT/serve/cli_mamba \
      --stats $R4/serve_cli_stats_mamba.json > $R4/serve_cli_mamba.log 2>&1
  echo "rc=$? $(date -u +%H:%M:%S)" | tee -a $R4/queue.log
fi
echo "=== DONE r4e $(date -u +%H:%M:%S) ===" | tee -a $R4/queue.log
