#!/bin/bash
# Round-4 session-3 queue: the r4b campaign re-fired after the VM restart
# wiped experiments/out_gen (only committed artifacts survived). Ordered by
# judge priority: trained ckpts for all three generators + classifier first,
# then everything that depends on them — fidelity corpora x3 (VERDICT r3
# Missing #2), the xLSTM windowed-parity row (Missing #4), serve CLI smoke
# (item 10), int8 quality evidence (Weak #2).
#
# Artifact discipline (VERDICT r3 item 9): stages tee to committed
# experiments/r4/<stage>.log; small JSONs copied into experiments/r4/;
# no rm -rf of published evidence.
set -u
cd /root/repo
OUT=experiments/out_gen
R4=experiments/r4
mkdir -p $R4 $OUT
PY=/opt/venv/bin/python
export MUSICGEN_OUT=$OUT INT8_OUT=$OUT
# Persistent compile cache: repeated sampling-scan shapes across stages
# re-load instead of re-compiling (first compile of a sampling scan via
# the remote compiler is minutes).
export JAX_COMPILATION_CACHE_DIR=/root/repo/experiments/.jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

stage() { echo "=== R4C STAGE $1 $(date -u +%H:%M:%S) ===" | tee -a $R4/queue.log; }
rc() { echo "rc=$? $(date -u +%H:%M:%S)" | tee -a $R4/queue.log; }

stage "convergence mamba + classifier (augmented, val curves, 120 epochs)"
timeout 4500 $PY experiments/convergence.py --out $OUT \
    --epochs 120 --block-len 1024 --models mamba \
    --augmentation --classifier-epochs 150 > $R4/convergence_mamba.log 2>&1; rc
cp -f $OUT/summary.json $R4/summary_mamba.json 2>/dev/null
cp -f $OUT/training_log_mamba.json $OUT/accuracy_mamba.json \
      $OUT/training_log_classifier.json $R4/ 2>/dev/null

stage "convergence transformer + xlstm (augmented, val curves, 120 epochs)"
timeout 7200 $PY experiments/convergence.py --out $OUT \
    --epochs 120 --block-len 1024 --models transformer xlstm \
    --augmentation > $R4/convergence_tx.log 2>&1; rc
cp -f $OUT/summary.json $R4/summary_tx.json 2>/dev/null
cp -f $OUT/training_log_transformer.json $OUT/training_log_xlstm.json \
      $OUT/accuracy_transformer.json $OUT/accuracy_xlstm.json $R4/ 2>/dev/null

stage "fidelity transformer per-band 20 (batch 4)"
timeout 5400 $PY experiments/fidelity.py --out $OUT \
    --model transformer --per-band 20 --length 2000 --batch 4 \
    > $R4/fidelity_transformer.log 2>&1; rc
cp -f $OUT/fidelity_transformer.json $R4/ 2>/dev/null

stage "fidelity xlstm per-band 20 (batch 4)"
timeout 5400 $PY experiments/fidelity.py --out $OUT \
    --model xlstm --per-band 20 --length 2000 --batch 4 \
    > $R4/fidelity_xlstm.log 2>&1; rc
cp -f $OUT/fidelity_xlstm.json $R4/ 2>/dev/null

stage "fidelity mamba per-band 20 (batch 4)"
timeout 5400 $PY experiments/fidelity.py --out $OUT \
    --model mamba --per-band 20 --length 2000 --batch 4 \
    > $R4/fidelity_mamba.log 2>&1; rc
cp -f $OUT/fidelity_mamba.json $R4/ 2>/dev/null

stage "windowed parity xlstm (trained ckpt)"
timeout 5400 $PY experiments/windowed_parity.py --models xlstm \
    > $R4/windowed_xlstm.log 2>&1; rc

stage "serve CLI smoke (mixed-length requests, trained mamba)"
timeout 3600 $PY -m musicgen_tpu.cli.serve --model mamba \
    --ckpt "$(ls -dt $OUT/ckpt/mamba/loss_* | head -1)" \
    --data $OUT/np/midi --metadata $OUT/metadata.json \
    --requests '[{"composer":"Bach","length":2000},{"composer":"Mozart","length":500},{"composer":"Chopin","length":1000},{"composer":"Beethoven","length":250},{"composer":"Bach","length":1500},{"composer":"Mozart","length":750},{"composer":"Chopin","length":2000},{"composer":"Beethoven","length":400}]' \
    --output $OUT/serve/cli --stats $R4/serve_cli_stats.json \
    > $R4/serve_cli.log 2>&1; rc

stage "int8 decode quality incl. GPTQ (trained ckpt)"
timeout 3600 $PY experiments/int8_quality.py > $R4/int8_quality.log 2>&1; rc
cp -f $OUT/int8_quality*.json $R4/ 2>/dev/null

stage "DONE r4c"
