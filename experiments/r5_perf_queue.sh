#!/bin/bash
# Round-5 perf queue — VERDICT r4 items 4, 5, 10. Waits for the evidence
# queue's DONE marker (one TPU; stages must serialize), then:
#   1. transformer continuous batching re-measure (rel-table gather fix
#      in ops/attention.relpos_attention_step — r4: 827 tok/s aggregate)
#   2. serve CLI cold vs warm process TTFC (persistent compilation cache
#      now default in every CLI — r4: TTFC 108-243 s)
#   3. mamba batch-scaling probes between the r4 sweep's B2-plain and
#      B8-remat points (B4/B6 plain, B8 chunk-only) — find the aggregate
#      tok/s optimum on 16 GB
#   4. bench.py headline re-run
set -u
cd /root/repo
OUT=experiments/out_gen
R5=experiments/r5
mkdir -p $R5
PY=/opt/venv/bin/python
export MUSICGEN_OUT=$OUT INT8_OUT=$OUT
export JAX_COMPILATION_CACHE_DIR=/root/repo/experiments/.jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

stage() { echo "=== R5P STAGE $1 $(date -u +%H:%M:%S) ===" | tee -a $R5/queue.log; }
rc() { echo "rc=$? $(date -u +%H:%M:%S)" | tee -a $R5/queue.log; }
validate() { $PY experiments/validate_artifact.py "$@" 2>&1 | tee -a $R5/queue.log; }

stage "perf queue waiting for the evidence queue DONE marker"
for i in $(seq 1 2880); do  # up to 8 h, poll 10 s
  grep -q "DONE r5 evidence queue" $R5/queue.log 2>/dev/null && break
  sleep 10
done
grep -q "DONE r5 evidence queue" $R5/queue.log || {
  echo "evidence queue never finished; proceeding anyway" | tee -a $R5/queue.log; }

stage "transformer serving slots=8 (rel-gather fix A/B vs r4's 827 tok/s)"
timeout 1800 $PY experiments/bench_serve_sched.py --model transformer \
    --slots 8 --chunk 64 > $R5/serve_transformer.log 2>&1; rc

stage "serve CLI cold-process TTFC (fresh cache dir -> true cold)"
SERVE_REQS='[{"composer":"Bach","length":2000},{"composer":"Mozart","length":500},{"composer":"Chopin","length":1000},{"composer":"Beethoven","length":250},{"composer":"Bach","length":1500},{"composer":"Mozart","length":750},{"composer":"Chopin","length":2000},{"composer":"Beethoven","length":400}]'
MAMBA_CKPT=$($PY -c "from musicgen_tpu.utils.ckpt_sanity import select_checkpoint; print(select_checkpoint('$OUT/ckpt/mamba'))")
export MUSICGEN_CACHE_DIR=/root/repo/experiments/.servecache_r5
rm -rf $MUSICGEN_CACHE_DIR
unset JAX_COMPILATION_CACHE_DIR
timeout 1200 $PY -m musicgen_tpu.cli.serve --model mamba \
    --ckpt "$MAMBA_CKPT" --data $OUT/np/midi --metadata $OUT/metadata.json \
    --requests "$SERVE_REQS" \
    --output $OUT/serve/cold --stats $R5/serve_cold_stats.json \
    > $R5/serve_cold.log 2>&1; rc
validate stats $R5/serve_cold_stats.json

stage "serve CLI warm-process TTFC (same program, second process)"
timeout 1200 $PY -m musicgen_tpu.cli.serve --model mamba \
    --ckpt "$MAMBA_CKPT" --data $OUT/np/midi --metadata $OUT/metadata.json \
    --requests "$SERVE_REQS" \
    --output $OUT/serve/warm --stats $R5/serve_warm_stats.json \
    > $R5/serve_warm.log 2>&1; rc
validate stats $R5/serve_warm_stats.json
export JAX_COMPILATION_CACHE_DIR=/root/repo/experiments/.jaxcache

stage "mamba batch-scaling probes (B4/B6 plain, B8 chunk-only, B4 chunk)"
{
  for cfgspec in mamba:4 mamba:6 mamba:4:0:256 mamba:8:0:256; do
    echo "--- $cfgspec ---"
    timeout 900 $PY experiments/bench_train.py --single "$cfgspec" || \
      echo "$cfgspec: FAILED rc=$?"
  done
} > $R5/bench_mamba_batch.log 2>&1; rc

stage "bench.py headline"
timeout 1800 $PY bench.py > $R5/bench_headline.log 2>&1; rc
tail -1 $R5/bench_headline.log | tee -a $R5/queue.log

stage "DONE r5 perf queue"
