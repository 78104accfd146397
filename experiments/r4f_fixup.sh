#!/bin/bash
# Backfill watcher for r4d: stage 1 (transformer+xlstm+classifier) runs close
# to its 2700s timeout because each model's first train-step compile through
# the remote TPU compiler costs minutes. If the timeout cuts the classifier
# (trained LAST by convergence.py), every fidelity stage fails fast on the
# missing ckpt. This watcher waits for the r4d queue to finish, then
# backfills: classifier training, then any missing fidelity JSONs.
set -u
cd /root/repo
OUT=experiments/out_gen
R4=experiments/r4
PY=/opt/venv/bin/python
export MUSICGEN_OUT=$OUT INT8_OUT=$OUT
export JAX_COMPILATION_CACHE_DIR=/root/repo/experiments/.jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

# Chain behind r4e (the serve-smoke watcher) so the two fixups never hit
# the single TPU chip concurrently.
for i in $(seq 1 600); do
  grep -q "DONE r4e" $R4/queue.log 2>/dev/null && break
  sleep 30
done
grep -q "DONE r4e" $R4/queue.log 2>/dev/null || exit 1

if ! ls $OUT/ckpt/classifier/loss_* >/dev/null 2>&1; then
  echo "=== R4F STAGE classifier backfill (150 epochs) $(date -u +%H:%M:%S) ===" | tee -a $R4/queue.log
  timeout 2700 $PY -m musicgen_tpu.cli.train_classifier \
      --data $OUT/np --metadata $OUT/metadata.json --epochs 150 \
      --ckpt-dir $OUT/ckpt/classifier \
      --log $OUT/training_log_classifier.json \
      > $R4/classifier_backfill.log 2>&1
  echo "rc=$? $(date -u +%H:%M:%S)" | tee -a $R4/queue.log
  cp -f $OUT/training_log_classifier.json $R4/ 2>/dev/null
fi

for model in xlstm transformer mamba; do
  [ -f $R4/fidelity_$model.json ] && continue
  ls $OUT/ckpt/$model/loss_* >/dev/null 2>&1 || continue
  ls $OUT/ckpt/classifier/loss_* >/dev/null 2>&1 || continue
  echo "=== R4F STAGE fidelity $model backfill (per-band 10) $(date -u +%H:%M:%S) ===" | tee -a $R4/queue.log
  timeout 1800 $PY experiments/fidelity.py --out $OUT \
      --model $model --per-band 10 --length 2000 --batch 4 \
      > $R4/fidelity_$model.log 2>&1
  echo "rc=$? $(date -u +%H:%M:%S)" | tee -a $R4/queue.log
  cp -f $OUT/fidelity_$model.json $R4/ 2>/dev/null
done

if ! grep -q "xlstm" $R4/windowed_xlstm.log 2>/dev/null; then
  echo "=== R4F STAGE windowed parity xlstm backfill $(date -u +%H:%M:%S) ===" | tee -a $R4/queue.log
  timeout 1800 $PY experiments/windowed_parity.py --models xlstm \
      > $R4/windowed_xlstm.log 2>&1
  echo "rc=$? $(date -u +%H:%M:%S)" | tee -a $R4/queue.log
fi
echo "=== DONE r4f $(date -u +%H:%M:%S) ===" | tee -a $R4/queue.log
