#!/bin/bash
# Round-4 session-4 queue: lean re-fire of the checkpoint campaign after the
# second VM restart (r4c never got a stage out; out_gen + the jax compile
# cache were wiped — only committed artifacts survived). Time-boxed hard:
# this session has ~1h of wall clock, so stages are ordered so that every
# completed stage closes a VERDICT r3 item even if the queue is cut off.
#   1. transformer+xlstm convergence + classifier  -> Missing #3 (val curves)
#   2. fidelity xlstm (reduced per-band 10)        -> Missing #2 (signature model)
#   3. windowed parity xlstm (trained ckpt)        -> Missing #4
#   4. fidelity transformer (per-band 10)          -> Missing #2
#   5. serve CLI smoke on the trained transformer  -> item 10
#   6. mamba retrain + int8 quality                -> Weak #2 evidence
# Artifact discipline: stages tee to committed experiments/r4/<stage>.log;
# small JSONs copied into experiments/r4/; no rm -rf of published evidence.
set -u
cd /root/repo
OUT=experiments/out_gen
R4=experiments/r4
mkdir -p $R4 $OUT
PY=/opt/venv/bin/python
export MUSICGEN_OUT=$OUT INT8_OUT=$OUT
export JAX_COMPILATION_CACHE_DIR=/root/repo/experiments/.jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

stage() { echo "=== R4D STAGE $1 $(date -u +%H:%M:%S) ===" | tee -a $R4/queue.log; }
rc() { echo "rc=$? $(date -u +%H:%M:%S)" | tee -a $R4/queue.log; }

stage "convergence transformer + xlstm + classifier (augmented, 120 epochs)"
timeout 2700 $PY experiments/convergence.py --out $OUT \
    --epochs 120 --block-len 1024 --models transformer xlstm \
    --augmentation --classifier-epochs 150 > $R4/convergence_tx.log 2>&1; rc
cp -f $OUT/summary.json $R4/summary_tx.json 2>/dev/null
cp -f $OUT/training_log_transformer.json $OUT/training_log_xlstm.json \
      $OUT/accuracy_transformer.json $OUT/accuracy_xlstm.json \
      $OUT/training_log_classifier.json $R4/ 2>/dev/null

stage "fidelity xlstm per-band 10 (batch 4)"
timeout 1500 $PY experiments/fidelity.py --out $OUT \
    --model xlstm --per-band 10 --length 2000 --batch 4 \
    > $R4/fidelity_xlstm.log 2>&1; rc
cp -f $OUT/fidelity_xlstm.json $R4/ 2>/dev/null

stage "windowed parity xlstm (trained ckpt)"
timeout 1200 $PY experiments/windowed_parity.py --models xlstm \
    > $R4/windowed_xlstm.log 2>&1; rc

stage "fidelity transformer per-band 10 (batch 4)"
timeout 1500 $PY experiments/fidelity.py --out $OUT \
    --model transformer --per-band 10 --length 2000 --batch 4 \
    > $R4/fidelity_transformer.log 2>&1; rc
cp -f $OUT/fidelity_transformer.json $R4/ 2>/dev/null

stage "serve CLI smoke (mixed-length requests, trained transformer)"
timeout 1200 $PY -m musicgen_tpu.cli.serve --model transformer \
    --ckpt "$(ls -dt $OUT/ckpt/transformer/loss_* | head -1)" \
    --data $OUT/np --metadata $OUT/metadata.json \
    --requests '[{"composer":"Bach","length":2000},{"composer":"Mozart","length":500},{"composer":"Chopin","length":1000},{"composer":"Beethoven","length":250},{"composer":"Bach","length":1500},{"composer":"Mozart","length":750},{"composer":"Chopin","length":2000},{"composer":"Beethoven","length":400}]' \
    --output $OUT/serve/cli --stats $R4/serve_cli_stats.json \
    > $R4/serve_cli.log 2>&1; rc

stage "convergence mamba retrain (augmented, 120 epochs)"
timeout 2700 $PY experiments/convergence.py --out $OUT \
    --epochs 120 --block-len 1024 --models mamba \
    --augmentation > $R4/convergence_mamba2.log 2>&1; rc

stage "fidelity mamba per-band 10 (batch 4)"
timeout 1500 $PY experiments/fidelity.py --out $OUT \
    --model mamba --per-band 10 --length 2000 --batch 4 \
    > $R4/fidelity_mamba.log 2>&1; rc
cp -f $OUT/fidelity_mamba.json $R4/ 2>/dev/null

stage "int8 decode quality incl. GPTQ (trained mamba ckpt)"
timeout 1800 $PY experiments/int8_quality.py > $R4/int8_quality.log 2>&1; rc
cp -f $OUT/int8_quality*.json $R4/ 2>/dev/null

stage "DONE r4d"
