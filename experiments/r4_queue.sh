#!/bin/bash
# Round-4 TPU measurement campaign (VERDICT r3 item 1: run the stalled
# campaign to completion and COMMIT the evidence).
#
# Artifact discipline (VERDICT r3 item 9):
#   - never `rm -rf` previously published evidence;
#   - every stage tees to experiments/r4/<stage>.log;
#   - small JSON artifacts are copied into experiments/r4/ (committed);
#   - large regenerables (ckpts, np corpus) stay in experiments/out_gen/
#     (gitignored, but cited logs live in r4/).
#
# Order: judge-priority quick benches first (diffusion e2e is the
# twice-carried item), long convergence runs last, so a mid-round tunnel
# loss still lands the critical measurements.
set -u
cd /root/repo
OUT=experiments/out_gen
R4=experiments/r4
mkdir -p $R4 $OUT
PY=/opt/venv/bin/python
export MUSICGEN_OUT=$OUT INT8_OUT=$OUT DIFF_E2E_OUT=$OUT

stage() { echo "=== STAGE $1 $(date -u +%H:%M:%S) ===" | tee -a $R4/queue.log; }
rc() { echo "rc=$? $(date -u +%H:%M:%S)" | tee -a $R4/queue.log; }

# The 08-19 04:22 run died mid-save leaving a corrupted orbax -tmp dir
# that mtime-based newest_ckpt() would pick up. Remove ONLY that tmp.
rm -rf $OUT/ckpt/mamba/*.orbax-checkpoint-tmp

stage "diffusion e2e (carried twice; config-5 workload on-chip)"
timeout 7200 $PY experiments/diffusion_e2e.py > $R4/diffusion_e2e.log 2>&1; rc

stage "xlstm sampling incl. sb16 state variants"
timeout 7200 $PY experiments/bench_xlstm_sampling.py > $R4/bench_xlstm_sampling.log 2>&1; rc

stage "resident kernel A/B bf16"
timeout 5400 $PY experiments/bench_resident.py --quant bf16 > $R4/bench_resident_bf16.log 2>&1; rc
stage "resident kernel A/B int8w"
timeout 5400 $PY experiments/bench_resident.py --quant int8w > $R4/bench_resident_int8w.log 2>&1; rc

stage "MFU batch sweep (2,8,16,32 x 4 models)"
timeout 10800 $PY experiments/bench_train.py --batch 2,8,16,32 > $R4/bench_train_sweep.log 2>&1; rc
for spec in mamba:2:0:256 mamba:2:1:0 mamba:32:0:256 transformer:2:0:256 transformer:16:0:256; do
  timeout 3600 $PY experiments/bench_train.py --single $spec >> $R4/bench_train_sweep.log 2>&1
done

stage "transformer train-step breakdown"
timeout 3600 $PY experiments/profile_train.py --model transformer > $R4/profile_transformer.log 2>&1; rc

stage "serve scheduler benches (transformer / xlstm / int8w / sb16 / mamba)"
timeout 5400 $PY experiments/bench_serve_sched.py --model transformer > $R4/serve_transformer.log 2>&1; rc
timeout 5400 $PY experiments/bench_serve_sched.py --model xlstm > $R4/serve_xlstm.log 2>&1; rc
timeout 5400 $PY experiments/bench_serve_sched.py --model xlstm --quant int8w > $R4/serve_xlstm_int8w.log 2>&1; rc
timeout 5400 $PY experiments/bench_serve_sched.py --model xlstm --quant int8w-sb16 > $R4/serve_xlstm_int8w_sb16.log 2>&1; rc
timeout 5400 $PY experiments/bench_serve_sched.py --model mamba > $R4/serve_mamba.log 2>&1; rc

stage "memory probe (remat / loss-chunk / fit boundary, empirical)"
timeout 7200 $PY experiments/mem_probe.py > $R4/mem_probe.log 2>&1; rc

stage "convergence mamba + classifier (augmented, val curves, 120 epochs)"
timeout 18000 $PY experiments/convergence.py --out $OUT \
    --epochs 120 --block-len 1024 --models mamba \
    --augmentation --classifier-epochs 150 > $R4/convergence_mamba.log 2>&1; rc
cp -f $OUT/summary.json $R4/summary_mamba.json 2>/dev/null
cp -f $OUT/training_log_mamba.json $OUT/accuracy_mamba.json $R4/ 2>/dev/null

stage "fidelity mamba per-band 20"
timeout 10800 $PY experiments/fidelity.py --out $OUT \
    --model mamba --per-band 20 --length 2000 > $R4/fidelity_mamba.log 2>&1; rc
cp -f $OUT/fidelity_mamba.json $R4/ 2>/dev/null

stage "int8 decode quality incl. GPTQ (trained ckpt)"
timeout 7200 $PY experiments/int8_quality.py > $R4/int8_quality.log 2>&1; rc
cp -f $OUT/int8_quality*.json $R4/ 2>/dev/null

stage "serve CLI smoke (mixed-length requests, trained mamba)"
timeout 7200 $PY -m musicgen_tpu.cli.serve --model mamba \
    --ckpt "$(ls -dt $OUT/ckpt/mamba/loss_* | head -1)" \
    --data $OUT/np/midi --metadata $OUT/metadata.json \
    --requests '[{"composer":"Bach","length":2000},{"composer":"Mozart","length":500},{"composer":"Chopin","length":1000},{"composer":"Beethoven","length":250},{"composer":"Bach","length":1500},{"composer":"Mozart","length":750},{"composer":"Chopin","length":2000},{"composer":"Beethoven","length":400}]' \
    --output $OUT/serve/cli --stats $R4/serve_cli_stats.json \
    > $R4/serve_cli.log 2>&1; rc

stage "convergence transformer + xlstm (augmented, 120 epochs)"
timeout 28800 $PY experiments/convergence.py --out $OUT \
    --epochs 120 --block-len 1024 --models transformer xlstm \
    --augmentation > $R4/convergence_tx.log 2>&1; rc
cp -f $OUT/summary.json $R4/summary_tx.json 2>/dev/null
cp -f $OUT/training_log_transformer.json $OUT/training_log_xlstm.json \
      $OUT/accuracy_transformer.json $OUT/accuracy_xlstm.json $R4/ 2>/dev/null

stage "windowed parity xlstm (on the trained ckpt)"
timeout 10800 $PY experiments/windowed_parity.py --models xlstm > $R4/windowed_xlstm.log 2>&1; rc

stage "fidelity transformer per-band 20"
timeout 10800 $PY experiments/fidelity.py --out $OUT \
    --model transformer --per-band 20 --length 2000 > $R4/fidelity_transformer.log 2>&1; rc
cp -f $OUT/fidelity_transformer.json $R4/ 2>/dev/null

stage "fidelity xlstm per-band 20"
timeout 10800 $PY experiments/fidelity.py --out $OUT \
    --model xlstm --per-band 20 --length 2000 > $R4/fidelity_xlstm.log 2>&1; rc
cp -f $OUT/fidelity_xlstm.json $R4/ 2>/dev/null

stage "bench.py headline"
timeout 3600 $PY bench.py > $R4/bench_headline.log 2>&1; rc

stage "DONE"
