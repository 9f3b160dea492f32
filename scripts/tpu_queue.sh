#!/bin/bash
# TPU job queue: probe until the axon tunnel answers, then run the queued
# round-3 TPU jobs in priority order. Each job logs to outputs/tpu_queue/.
# Safe to re-run: finished jobs are skipped via sentinel files.
cd /root/repo
mkdir -p outputs/tpu_queue
LOG=outputs/tpu_queue
probe() {
  timeout 240 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((512, 512), jnp.bfloat16)
assert jax.devices()[0].platform == "tpu"
(x @ x).sum().block_until_ready()
EOF
}

echo "$(date -u +%T) waiting for TPU..." >> $LOG/queue.log
until probe; do
  echo "$(date -u +%T) tpu probe failed; retry in 120s" >> $LOG/queue.log
  sleep 120
done
echo "$(date -u +%T) TPU UP — starting queue" >> $LOG/queue.log

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  [ -e "$LOG/$name.done" ] && { echo "skip $name (done)" >> $LOG/queue.log; return; }
  echo "$(date -u +%T) START $name" >> $LOG/queue.log
  timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "$(date -u +%T) END $name rc=$rc" >> $LOG/queue.log
  [ $rc -eq 0 ] && touch "$LOG/$name.done"
}

# 1. Quick benches of the two perf laggards (tells us if the new kernels
#    — DimeNet++ triplet fusion, EqV2 K-compaction — land >=1x)
run bench_dimenetpp 2400 python bench.py --model dimenetpp
run bench_eqv2     3600 python bench.py --model equiformer_v2
run bench_gemnet   2400 python bench.py --model gemnet_oc

# 2. DimeNet++ accuracy RERUN: the acc_dimenetpp.json on disk (E-MAE 41.7 Eh,
#    diverged) predates the init-divergence fix (bb4569d) and the
#    energy-offset fix (6882065)
run acc_dimenetpp 8000 python examples/train_accuracy.py --model dimenetpp \
    --max-epochs 1500 --out results/acc_dimenetpp.json

# 3. First PhiSNet precision run (checkpointed + partial --out every chunk;
#    even an interrupted run leaves a committed curve)
run phisnet_precision 21000 python examples/hamiltonian_precision.py --model phisnet \
    --state outputs/hp_phisnet_state.msgpack --out results/acc_phisnet.json \
    --target 1e-4 --max-steps 40000

# 4. EquiformerV2 accuracy datapoint (the missing zoo row)
run acc_eqv2 14000 python examples/train_accuracy.py --model equiformer_v2 \
    --max-epochs 300 --out results/acc_equiformer_v2.json

# 5. eSCN accuracy rerun (VERDICT r2 weak #3: 0.127 Eh at only 150 epochs —
#    give it the peers' epoch budget before concluding anything)
run acc_escn 14000 python examples/train_accuracy.py --model escn \
    --max-epochs 400 --out results/acc_escn.json

# 6. QHNet precision restart (r2 state was lost at the round boundary; the
#    committed curve bottomed at 1.10e-4 vs the <=1e-4 bar — restart fresh
#    with chunk snapshots + partial --out so this one closes)
run qhnet_precision 21000 python examples/hamiltonian_precision.py --model qhnet \
    --state outputs/hp_qhnet_state.msgpack --out results/acc_qhnet_r3.json \
    --target 1e-4 --max-steps 60000

# 7. Step-time ablation profiles for the remaining laggards (quick; informs
#    the next kernel pass if benches above still land <1x)
run profile_eqv2   3000 python examples/profile_step.py --model equiformer_v2
run profile_gemnet 3000 python examples/profile_step.py --model gemnet_oc

echo "$(date -u +%T) QUEUE COMPLETE" >> $LOG/queue.log
touch $LOG/ALL_DONE
