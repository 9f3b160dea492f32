#!/bin/bash
# Round-4 TPU job queue (VERDICT r3 items #2/#3/#5/#7/#10). Sequential on
# the one tunneled chip; each job logs to outputs/tpu_queue/ and is skipped
# on re-run via sentinel files. Order: quick profiles first (they inform
# the session's CPU-side kernel work), then the accuracy/precision runs.
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

echo "$(date -u +%T) r4 queue: probing TPU..." >> $LOG/queue.log
until probe; do
  echo "$(date -u +%T) tpu probe failed; retry in 120s" >> $LOG/queue.log
  sleep 120
done
echo "$(date -u +%T) TPU UP — starting r4 queue" >> $LOG/queue.log

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  [ -e "$LOG/$name.done" ] && { echo "skip $name (done)" >> $LOG/queue.log; return; }
  echo "$(date -u +%T) START $name" >> $LOG/queue.log
  timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "$(date -u +%T) END $name rc=$rc" >> $LOG/queue.log
  [ $rc -eq 0 ] && touch "$LOG/$name.done"
}

# 1. Step-time ablation profiles for the two perf laggards (VERDICT #2
#    throughput half + #10) — quick, and they drive this session's kernel work.
run profile_dimenetpp 1200 python examples/profile_step.py --model dimenetpp
run profile_gemnet    1200 python examples/profile_step.py --model gemnet_oc

# 2. DimeNet++ fixture sanity: 150 epochs. The r3 divergence (41.7 Eh)
#    predates the zero-init lin_out fix; confirm the loss actually descends
#    before committing 4000 s to the full rerun.
run acc_dimenetpp_sanity 1500 python examples/train_accuracy.py --model dimenetpp \
    --max-epochs 150 --out /tmp/acc_dpp_sanity.json

# 3. Full DimeNet++ accuracy rerun (VERDICT #2 accuracy half).
run acc_dimenetpp 4200 python examples/train_accuracy.py --model dimenetpp \
    --max-epochs 1500 --out results/acc_dimenetpp.json

# 4. First PhiSNet precision run (VERDICT #3): checkpointed, partial --out
#    every chunk; target = the published tiny H-MAE.
run phisnet_precision 5400 python examples/hamiltonian_precision.py --model phisnet \
    --state outputs/hp_phisnet_state.msgpack --out results/acc_phisnet.json \
    --schedule cosine --max-steps 12000 --target 1.9e-4

# 5. QHNet precision to its 1e-4 target (VERDICT #5): cosine terminal decay
#    (the r3 plateau run stalled at 1.10e-4). Fresh state (r3 snapshot was
#    lost at the round boundary); writes acc_qhnet_r4.json so the committed
#    1.10e-4 curve is only superseded if this run does better.
run qhnet_precision 5400 python examples/hamiltonian_precision.py --model qhnet \
    --state outputs/hp_qhnet_state.msgpack --out results/acc_qhnet_r4.json \
    --schedule cosine --max-steps 20000 --target 1e-4

# 6. Externalized optimization benchmark (VERDICT #7): cross-model
#    references on the committed optim fixture DB.
run optimize_benchmark 4200 python examples/optimize_benchmark.py \
    --out results/optimize_benchmark.json

echo "$(date -u +%T) R4 QUEUE COMPLETE" >> $LOG/queue.log
touch $LOG/R4_ALL_DONE
