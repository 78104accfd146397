#!/bin/bash
# Backfill watcher for r4d (v2). Stage 1's 2700s timeout cannot cover
# transformer (slow flash-attention compile + ~25 min of epochs) AND xlstm
# AND the classifier, so this watcher re-derives whatever is missing once
# the queue and the serve fixup (r4e) are done:
#   1. xlstm convergence run if no ckpt (cli.train directly — the corpus and
#      np/ are already in place; convergence.py would redo nothing else).
#   2. classifier training if no ckpt.
#   3. accuracy eval for any generator missing accuracy_<model>.json.
#   4. fidelity per-band 10 for any generator missing fidelity_<model>.json.
#   5. windowed-parity xlstm re-run if the first pass ran on random params.
# Chained behind r4e so fixups never hit the single TPU chip concurrently.
set -u
cd /root/repo
OUT=experiments/out_gen
R4=experiments/r4
PY=/opt/venv/bin/python
export MUSICGEN_OUT=$OUT INT8_OUT=$OUT
export JAX_COMPILATION_CACHE_DIR=/root/repo/experiments/.jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

for i in $(seq 1 600); do
  grep -q "DONE r4e" $R4/queue.log 2>/dev/null && break
  sleep 30
done
grep -q "DONE r4e" $R4/queue.log 2>/dev/null || exit 1

mark() { echo "=== R4F STAGE $1 $(date -u +%H:%M:%S) ===" | tee -a $R4/queue.log; }
rc() { echo "rc=$? $(date -u +%H:%M:%S)" | tee -a $R4/queue.log; }

if ! ls $OUT/ckpt/xlstm/loss_* >/dev/null 2>&1; then
  mark "xlstm convergence backfill (augmented, 120 epochs)"
  timeout 3600 $PY -m musicgen_tpu.cli.train --model xlstm \
      --data $OUT/np --metadata $OUT/metadata.json \
      --epochs 120 --block-len 1024 --batch-size 2 --augmentation \
      --ckpt-dir $OUT/ckpt/xlstm --log $OUT/training_log_xlstm.json \
      > $R4/convergence_xlstm.log 2>&1; rc
  cp -f $OUT/training_log_xlstm.json $R4/ 2>/dev/null
fi

if ! ls $OUT/ckpt/classifier/loss_* >/dev/null 2>&1; then
  mark "classifier backfill (150 epochs)"
  timeout 2700 $PY -m musicgen_tpu.cli.train_classifier \
      --data $OUT/np --metadata $OUT/metadata.json --epochs 150 \
      --ckpt-dir $OUT/ckpt/classifier \
      --log $OUT/training_log_classifier.json \
      > $R4/classifier_backfill.log 2>&1; rc
  cp -f $OUT/training_log_classifier.json $R4/ 2>/dev/null
fi

for model in transformer xlstm mamba; do
  [ -f $R4/accuracy_$model.json ] && continue
  ls $OUT/ckpt/$model/loss_* >/dev/null 2>&1 || continue
  mark "accuracy eval backfill $model"
  timeout 1800 $PY -m musicgen_tpu.cli.evaluate accuracy --model $model \
      --ckpt "$(ls -dt $OUT/ckpt/$model/loss_* | head -1)" \
      --data $OUT/np --metadata $OUT/metadata.json --block-len 1024 \
      --repeats 20 --out $OUT/accuracy_$model.json \
      > $R4/accuracy_$model.log 2>&1; rc
  cp -f $OUT/accuracy_$model.json $R4/ 2>/dev/null
done

for model in xlstm transformer mamba; do
  [ -f $R4/fidelity_$model.json ] && continue
  ls $OUT/ckpt/$model/loss_* >/dev/null 2>&1 || continue
  ls $OUT/ckpt/classifier/loss_* >/dev/null 2>&1 || continue
  mark "fidelity $model backfill (per-band 10)"
  timeout 1800 $PY experiments/fidelity.py --out $OUT \
      --model $model --per-band 10 --length 2000 --batch 4 \
      > $R4/fidelity_$model.log 2>&1; rc
  cp -f $OUT/fidelity_$model.json $R4/ 2>/dev/null
done

if grep -q "random params" $R4/windowed_xlstm.log 2>/dev/null || \
   [ ! -f $R4/windowed_xlstm.log ]; then
  if ls $OUT/ckpt/xlstm/loss_* >/dev/null 2>&1; then
    mark "windowed parity xlstm re-run (trained ckpt)"
    timeout 1800 $PY experiments/windowed_parity.py --models xlstm \
        > $R4/windowed_xlstm.log 2>&1; rc
  fi
fi
echo "=== DONE r4f $(date -u +%H:%M:%S) ===" | tee -a $R4/queue.log
