#!/bin/bash
# Round-5 TPU queue, stage 2 (chained after tpu_queue_r5.sh / R5S1_DONE).
#   1. optimize benchmark rerun with per-model energy alignment (VERDICT #6)
#   2. eSCN fixture accuracy retrain, tuned run config (VERDICT #7)
#   3. QHNet precision toward 1e-4, chunked + state-resumable (VERDICT #3)
cd /root/repo
mkdir -p outputs/tpu_queue
LOG=outputs/tpu_queue
export JAX_COMPILATION_CACHE_DIR=/root/repo/outputs/xla_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  [ -e "$LOG/$name.done" ] && { echo "skip $name (done)" >> $LOG/queue.log; return; }
  echo "$(date -u +%T) START $name" >> $LOG/queue.log
  timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "$(date -u +%T) END $name rc=$rc" >> $LOG/queue.log
  [ $rc -eq 0 ] && touch "$LOG/$name.done"
}

run optbench 2400 python examples/optimize_benchmark.py \
    --out results/optimize_benchmark.json

run acc_escn_r5 3600 python examples/train_accuracy.py --model escn \
    --lr 4e-4 --plateau-patience 60 --early-stop 400 --energy-coef 5 \
    --max-epochs 1500 --out results/acc_escn_r5.json

# chunked + resumable: every 200-epoch chunk snapshots the TrainState and
# rewrites the partial JSON, so a kill here costs at most one chunk.
run qhnet_precision_r5 15000 python examples/hamiltonian_precision.py \
    --model qhnet --schedule cosine --lr 7e-4 --max-steps 14000 \
    --state outputs/hp_qhnet_state_r5.msgpack \
    --out results/acc_qhnet_r5.json --target 1e-4

echo "$(date -u +%T) R5 S2 QUEUE COMPLETE" >> $LOG/queue.log
touch $LOG/R5S2_DONE
