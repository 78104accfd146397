#!/bin/bash
# Round-3 TPU queue, part 3 — measures the session-4/5 additions on the
# chip after parts 1-2: the xLSTM bf16-stored-matrix-state decode variants
# ('-sb16' quant suffix: the mLSTM matrix memory streams bf16, halving the
# ~113 MB/token state traffic that dominates once weights are int8).
set -u
cd /root/repo
OUT=experiments/out_gen
PY=/opt/venv/bin/python

stage() { echo "=== STAGE $1 $(date -u +%H:%M:%S) ===" | tee -a $OUT/queue3.log; }

stage "xlstm sampling incl. sb16 state-storage variants"
timeout 7200 $PY experiments/bench_xlstm_sampling.py \
    > $OUT/bench_xlstm_sb16.log 2>&1
echo "rc=$?" | tee -a $OUT/queue3.log

stage "xlstm serve scheduler at int8w-sb16"
timeout 7200 $PY experiments/bench_serve_sched.py --model xlstm \
    --quant int8w-sb16 \
    > $OUT/serve_xlstm_int8w_sb16.log 2>&1
echo "rc=$?" | tee -a $OUT/queue3.log

stage "DONE"
