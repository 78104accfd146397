#!/bin/bash
# Round-5 evidence queue — VERDICT r4 "Next round" items 1-3, 8, 9.
# Ordering per VERDICT #2: classifier-fidelity FIRST (3rd round it slipped),
# then the xLSTM trained-checkpoint chain (the round-4 poisoned-evidence
# gap), then the context-length sweep and the int8-quality honesty re-run.
# Every artifact gets a .VALID/.INVALID sidecar from
# experiments/validate_artifact.py (VERDICT #8) — stage rc alone never
# marks validity.
set -u
cd /root/repo
OUT=experiments/out_gen
R5=experiments/r5
mkdir -p $R5 $OUT
PY=/opt/venv/bin/python
export MUSICGEN_OUT=$OUT INT8_OUT=$OUT
export JAX_COMPILATION_CACHE_DIR=/root/repo/experiments/.jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

stage() { echo "=== R5 STAGE $1 $(date -u +%H:%M:%S) ===" | tee -a $R5/queue.log; }
rc() { echo "rc=$? $(date -u +%H:%M:%S)" | tee -a $R5/queue.log; }
validate() { $PY experiments/validate_artifact.py "$@" 2>&1 | tee -a $R5/queue.log; }

# The r4 crash-save of near-init xLSTM weights (training log has zero
# optimizer steps — the producing run died at step 1). It poisoned every
# r4 harness; remove so nothing can consume it. Guarded by exact name.
rm -rf "$OUT/ckpt/xlstm/loss_0.00_time_2026-08-20-06-31-36"

stage "fidelity mamba per-band 10 (batch 4)"
timeout 2700 $PY experiments/fidelity.py --out $OUT \
    --model mamba --per-band 10 --length 2000 --batch 4 \
    > $R5/fidelity_mamba.log 2>&1; rc
cp -f $OUT/fidelity_mamba.json $R5/ 2>/dev/null
validate fidelity $R5/fidelity_mamba.json

stage "fidelity transformer per-band 10 (batch 4 -> VMEM-admission XLA path)"
timeout 3600 $PY experiments/fidelity.py --out $OUT \
    --model transformer --per-band 10 --length 2000 --batch 4 \
    > $R5/fidelity_transformer.log 2>&1; rc
cp -f $OUT/fidelity_transformer.json $R5/ 2>/dev/null
validate fidelity $R5/fidelity_transformer.json

stage "xlstm convergence 120ep augmented (the r4 crash, re-landed)"
timeout 10800 $PY experiments/convergence.py --out $OUT \
    --epochs 120 --block-len 1024 --models xlstm \
    --augmentation > $R5/convergence_xlstm.log 2>&1; rc
validate curve $OUT/training_log_xlstm.json
if [ ! -f $OUT/training_log_xlstm.json.VALID ]; then
  stage "xlstm convergence RETRY (first attempt did not produce a live curve)"
  timeout 10800 $PY experiments/convergence.py --out $OUT \
      --epochs 120 --block-len 1024 --models xlstm \
      --augmentation > $R5/convergence_xlstm_retry.log 2>&1; rc
  validate curve $OUT/training_log_xlstm.json
fi
cp -f $OUT/training_log_xlstm.json $OUT/training_log_xlstm.json.* \
      $OUT/accuracy_xlstm.json $R5/ 2>/dev/null
cp -f $OUT/summary.json $R5/summary_xlstm.json 2>/dev/null
validate accuracy $R5/accuracy_xlstm.json

stage "fidelity xlstm per-band 10 (batch 4, sanity-gated trained ckpt)"
timeout 2700 $PY experiments/fidelity.py --out $OUT \
    --model xlstm --per-band 10 --length 2000 --batch 4 \
    > $R5/fidelity_xlstm.log 2>&1; rc
cp -f $OUT/fidelity_xlstm.json $R5/ 2>/dev/null
validate fidelity $R5/fidelity_xlstm.json

stage "windowed parity xlstm (trained ckpt — re-take of the r4 near-init number)"
timeout 1800 $PY experiments/windowed_parity.py --models xlstm \
    > $R5/windowed_xlstm.log 2>&1; rc

stage "accuracy-vs-context-length sweep mamba+xlstm x {1024,2048,3000} (SURVEY §6)"
for model in mamba xlstm; do
  CKPT=$($PY -c "from musicgen_tpu.utils.ckpt_sanity import select_checkpoint; print(select_checkpoint('$OUT/ckpt/$model', log_path='$OUT/training_log_$model.json'))" 2>/dev/null)
  if [ -z "$CKPT" ]; then
    echo "SKIP $model: no sane checkpoint" | tee -a $R5/queue.log; continue
  fi
  for len in 1024 2048 3000; do
    timeout 1500 $PY -m musicgen_tpu.cli.evaluate accuracy --model $model \
        --ckpt "$CKPT" --data $OUT/np --metadata $OUT/metadata.json \
        --block-len $len --repeats 10 \
        --out $R5/accuracy_${model}_ctx${len}.json \
        > $R5/accuracy_${model}_ctx${len}.log 2>&1; rc
    validate accuracy $R5/accuracy_${model}_ctx${len}.json
  done
done

stage "int8 decode quality incl. GPTQ on the CURRENT trained mamba ckpt (VERDICT #9)"
timeout 2400 $PY experiments/int8_quality.py > $R5/int8_quality.log 2>&1; rc
cp -f $OUT/int8_quality*.json $R5/ 2>/dev/null

stage "DONE r5 evidence queue"
