#!/bin/bash
# Round-5 queue, take 2. The VM restart (~22:00) killed the first r5 queue
# before any stage ran AND wiped every trained checkpoint in out_gen (the
# dataset np/ + midi/ survived via the driver's rebuild). So this queue
# retrains the full evidence chain from scratch, then runs the VERDICT r4
# items in risk-priority order:
#   evidence (items 1-3, 8, 9): mamba+classifier -> fidelity mamba ->
#     xlstm (+retry) -> fidelity xlstm -> windowed parity -> transformer ->
#     fidelity transformer -> ctx-length sweep -> int8 quality
#   perf (items 4, 5, 10), with the two QUICK serve stages interleaved
#     early so they land even if the round ends mid-queue:
#     serve TTFC cold/warm after the mamba ckpt exists; transformer
#     serving A/B (random-init weights are fine for tok/s) right after.
# Every artifact gets a .VALID/.INVALID sidecar (validate_artifact.py).
#
# Post-restart the axon backend intermittently wedges on first-touch of
# large programs (experiments/r5/watchdog.log); r5_watchdog.sh kills and
# relaunches this queue when it stalls >40 min. Each stage therefore marks
# completion with $R5/.done_<tag> and is skipped on relaunch, so a restart
# resumes at the first unfinished stage instead of retraining everything.
set -u
cd /root/repo
OUT=experiments/out_gen
R5=experiments/r5
mkdir -p $R5 $OUT
PY=/opt/venv/bin/python
export MUSICGEN_OUT=$OUT INT8_OUT=$OUT
export JAX_COMPILATION_CACHE_DIR=/root/repo/experiments/.jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

# stage() sleeps 90 s first: the post-restart backend wedges new clients
# that connect within seconds of the previous client's exit (DEV_NOTES r5
# session 2); the gap lets the device release cleanly between stages.
stage() { sleep 90; echo "=== R5B STAGE $1 $(date -u +%H:%M:%S) ===" | tee -a $R5/queue.log; }
rc() { echo "rc=$? $(date -u +%H:%M:%S)" | tee -a $R5/queue.log; }
validate() { $PY experiments/validate_artifact.py "$@" 2>&1 | tee -a $R5/queue.log; }
done_mark() { touch $R5/.done_$1; }
skip() { [ -f $R5/.done_$1 ] && { echo "=== R5B SKIP $1 (done) ===" | tee -a $R5/queue.log; return 0; }; return 1; }

if ! skip conv_mamba; then
stage "convergence mamba + classifier (augmented, 120 epochs + clf 150)"
timeout 9000 $PY experiments/convergence.py --out $OUT \
    --epochs 120 --block-len 1024 --models mamba \
    --augmentation --classifier-epochs 150 > $R5/convergence_mamba.log 2>&1; rc
cp -f $OUT/training_log_mamba.json $OUT/accuracy_mamba.json \
      $OUT/training_log_classifier.json $R5/ 2>/dev/null
cp -f $OUT/summary.json $R5/summary_mamba.json 2>/dev/null
validate curve $R5/training_log_mamba.json
validate accuracy $R5/accuracy_mamba.json
[ -f $R5/training_log_mamba.json.VALID ] && done_mark conv_mamba
fi

if ! skip fid_mamba; then
stage "fidelity mamba per-band 10 (batch 4)"
timeout 3600 $PY experiments/fidelity.py --out $OUT \
    --model mamba --per-band 10 --length 2000 --batch 4 \
    > $R5/fidelity_mamba.log 2>&1; rc
cp -f $OUT/fidelity_mamba.json $R5/ 2>/dev/null
validate fidelity $R5/fidelity_mamba.json
[ -f $R5/fidelity_mamba.json.VALID ] && done_mark fid_mamba
fi

if ! skip serve_ttfc; then
stage "serve CLI cold-process TTFC (fresh cache dir -> true cold)"
SERVE_REQS='[{"composer":"Bach","length":2000},{"composer":"Mozart","length":500},{"composer":"Chopin","length":1000},{"composer":"Beethoven","length":250},{"composer":"Bach","length":1500},{"composer":"Mozart","length":750},{"composer":"Chopin","length":2000},{"composer":"Beethoven","length":400}]'
MAMBA_CKPT=$($PY -c "from musicgen_tpu.utils.ckpt_sanity import select_checkpoint; print(select_checkpoint('$OUT/ckpt/mamba', log_path='$OUT/training_log_mamba.json'))" 2>/dev/null)
if [ -n "$MAMBA_CKPT" ]; then
  export MUSICGEN_CACHE_DIR=/root/repo/experiments/.servecache_r5
  rm -rf $MUSICGEN_CACHE_DIR
  OLDCACHE=$JAX_COMPILATION_CACHE_DIR
  export JAX_COMPILATION_CACHE_DIR=$MUSICGEN_CACHE_DIR
  timeout 1500 $PY -m musicgen_tpu.cli.serve --model mamba \
      --ckpt "$MAMBA_CKPT" --data $OUT/np/midi --metadata $OUT/metadata.json \
      --requests "$SERVE_REQS" \
      --output $OUT/serve/cold --stats $R5/serve_cold_stats.json \
      > $R5/serve_cold.log 2>&1; rc
  validate stats $R5/serve_cold_stats.json
  stage "serve CLI warm-process TTFC (same program, second process)"
  timeout 1500 $PY -m musicgen_tpu.cli.serve --model mamba \
      --ckpt "$MAMBA_CKPT" --data $OUT/np/midi --metadata $OUT/metadata.json \
      --requests "$SERVE_REQS" \
      --output $OUT/serve/warm --stats $R5/serve_warm_stats.json \
      > $R5/serve_warm.log 2>&1; rc
  validate stats $R5/serve_warm_stats.json
  export JAX_COMPILATION_CACHE_DIR=$OLDCACHE
  [ -f $R5/serve_warm_stats.json.VALID ] && done_mark serve_ttfc
else
  echo "SKIP serve TTFC: no sane mamba ckpt" | tee -a $R5/queue.log
fi
fi

if ! skip serve_transformer; then
stage "transformer serving slots=8 (rel-gather fix A/B vs r4's 827 tok/s)"
timeout 2400 $PY experiments/bench_serve_sched.py --model transformer \
    --slots 8 --chunk 64 > $R5/serve_transformer.log 2>&1; rc
grep -q "tok/s" $R5/serve_transformer.log && done_mark serve_transformer
fi

if ! skip conv_xlstm; then
stage "xlstm convergence 120ep augmented (the r4 crash, re-landed)"
timeout 7200 $PY experiments/convergence.py --out $OUT \
    --epochs 120 --block-len 1024 --models xlstm \
    --augmentation > $R5/convergence_xlstm.log 2>&1; rc
validate curve $OUT/training_log_xlstm.json
if [ ! -f $OUT/training_log_xlstm.json.VALID ]; then
  stage "xlstm convergence RETRY (first attempt did not produce a live curve)"
  timeout 7200 $PY experiments/convergence.py --out $OUT \
      --epochs 120 --block-len 1024 --models xlstm \
      --augmentation > $R5/convergence_xlstm_retry.log 2>&1; rc
  validate curve $OUT/training_log_xlstm.json
fi
cp -f $OUT/training_log_xlstm.json $OUT/training_log_xlstm.json.* \
      $OUT/accuracy_xlstm.json $R5/ 2>/dev/null
cp -f $OUT/summary.json $R5/summary_xlstm.json 2>/dev/null
validate accuracy $R5/accuracy_xlstm.json
[ -f $R5/training_log_xlstm.json.VALID ] && done_mark conv_xlstm
fi

if ! skip fid_xlstm; then
stage "fidelity xlstm per-band 10 (batch 4, sanity-gated trained ckpt)"
timeout 3600 $PY experiments/fidelity.py --out $OUT \
    --model xlstm --per-band 10 --length 2000 --batch 4 \
    > $R5/fidelity_xlstm.log 2>&1; rc
cp -f $OUT/fidelity_xlstm.json $R5/ 2>/dev/null
validate fidelity $R5/fidelity_xlstm.json
[ -f $R5/fidelity_xlstm.json.VALID ] && done_mark fid_xlstm
fi

if ! skip windowed_xlstm; then
stage "windowed parity xlstm (trained ckpt — re-take of the r4 near-init number)"
timeout 1800 $PY experiments/windowed_parity.py --models xlstm \
    > $R5/windowed_xlstm.log 2>&1; rc
grep -qi "parity\|ratio" $R5/windowed_xlstm.log && done_mark windowed_xlstm
fi

if ! skip conv_transformer; then
stage "transformer convergence 120ep augmented"
timeout 9000 $PY experiments/convergence.py --out $OUT \
    --epochs 120 --block-len 1024 --models transformer \
    --augmentation > $R5/convergence_transformer.log 2>&1; rc
cp -f $OUT/training_log_transformer.json $OUT/accuracy_transformer.json \
      $R5/ 2>/dev/null
validate curve $R5/training_log_transformer.json
validate accuracy $R5/accuracy_transformer.json
[ -f $R5/training_log_transformer.json.VALID ] && done_mark conv_transformer
fi

if ! skip fid_transformer; then
stage "fidelity transformer per-band 10 (batch 4 -> VMEM-admission XLA path)"
timeout 4500 $PY experiments/fidelity.py --out $OUT \
    --model transformer --per-band 10 --length 2000 --batch 4 \
    > $R5/fidelity_transformer.log 2>&1; rc
cp -f $OUT/fidelity_transformer.json $R5/ 2>/dev/null
validate fidelity $R5/fidelity_transformer.json
[ -f $R5/fidelity_transformer.json.VALID ] && done_mark fid_transformer
fi

if ! skip ctx_sweep; then
stage "accuracy-vs-context-length sweep mamba+xlstm x {1024,2048,3000} (SURVEY §6)"
for model in mamba xlstm; do
  CKPT=$($PY -c "from musicgen_tpu.utils.ckpt_sanity import select_checkpoint; print(select_checkpoint('$OUT/ckpt/$model', log_path='$OUT/training_log_$model.json'))" 2>/dev/null)
  if [ -z "$CKPT" ]; then
    echo "SKIP $model: no sane checkpoint" | tee -a $R5/queue.log; continue
  fi
  for len in 1024 2048 3000; do
    [ -f $R5/accuracy_${model}_ctx${len}.json.VALID ] && continue
    timeout 1500 $PY -m musicgen_tpu.cli.evaluate accuracy --model $model \
        --ckpt "$CKPT" --data $OUT/np --metadata $OUT/metadata.json \
        --block-len $len --repeats 10 \
        --out $R5/accuracy_${model}_ctx${len}.json \
        > $R5/accuracy_${model}_ctx${len}.log 2>&1; rc
    validate accuracy $R5/accuracy_${model}_ctx${len}.json
  done
done
done_mark ctx_sweep
fi

if ! skip int8_quality; then
stage "int8 decode quality incl. GPTQ on the CURRENT trained mamba ckpt (VERDICT #9)"
timeout 2400 $PY experiments/int8_quality.py > $R5/int8_quality.log 2>&1; rc
cp -f $OUT/int8_quality*.json $R5/ 2>/dev/null
done_mark int8_quality
fi

if ! skip mamba_batch; then
stage "mamba batch-scaling probes (B4/B6 plain, B4/B8 chunk-only)"
{
  for cfgspec in mamba:4 mamba:6 mamba:4:0:256 mamba:8:0:256; do
    echo "--- $cfgspec ---"
    timeout 900 $PY experiments/bench_train.py --single "$cfgspec" || \
      echo "$cfgspec: FAILED rc=$?"
  done
} > $R5/bench_mamba_batch.log 2>&1; rc
done_mark mamba_batch
fi

if ! skip bench_headline; then
stage "bench.py headline"
timeout 2400 $PY bench.py > $R5/bench_headline.log 2>&1; rc
tail -1 $R5/bench_headline.log | tee -a $R5/queue.log
grep -q "metric" $R5/bench_headline.log && done_mark bench_headline
fi

stage "DONE r5 evidence queue"
stage "DONE r5 perf queue"
