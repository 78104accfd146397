#!/bin/bash
# Round-3 TPU queue, part 2 — runs after r3_queue.sh (needs its trained
# checkpoints in experiments/out_gen). Covers: GPTQ decode-quality
# measurement on trained weights (VERDICT r2 item 7 follow-through) and
# fidelity corpora for the other two generators.
set -u
cd /root/repo
OUT=experiments/out_gen
PY=/opt/venv/bin/python

stage() { echo "=== STAGE $1 $(date -u +%H:%M:%S) ===" | tee -a $OUT/queue2.log; }

stage "int8 quality incl. GPTQ pack (trained ckpt)"
INT8_OUT=$OUT timeout 7200 $PY experiments/int8_quality.py \
    > $OUT/int8_quality_gptq.log 2>&1
echo "rc=$?" | tee -a $OUT/queue2.log

stage "fidelity transformer + xlstm (per-band 20)"
timeout 10800 $PY experiments/fidelity.py --out $OUT \
    --model transformer --per-band 20 --length 2000 \
    > $OUT/fidelity_transformer.log 2>&1
echo "rc=$?" | tee -a $OUT/queue2.log
timeout 10800 $PY experiments/fidelity.py --out $OUT \
    --model xlstm --per-band 20 --length 2000 \
    > $OUT/fidelity_xlstm.log 2>&1
echo "rc=$?" | tee -a $OUT/queue2.log

stage "DONE"
