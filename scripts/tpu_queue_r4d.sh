#!/bin/bash
# Round-4 TPU queue, part D. Waits for part C (phisnet resume →
# optimize benchmark → dimenetpp microbench) to finish, then:
#   1. GemNet-OC bench re-measure after the factorized triplet
#      (addition-theorem) path landed — VERDICT #10 target >= 2.5x.
#   2. GemNet-OC step ablation at the new step composition.
#   3. QHNet precision with cosine terminal decay to its 1e-4 target
#      (VERDICT #5) — the r4 queue silently skipped this via a stale
#      .done sentinel from an earlier run; fresh name here.
#   4. PhiSNet precision continuation if part C timed out short of the
#      1.9e-4 published target.
#   5. DimeNet++ ablation rerun with the fixed int-index profiler.
cd /root/repo
LOG=outputs/tpu_queue
mkdir -p $LOG

until [ -e "$LOG/R4C_ALL_DONE" ]; do sleep 60; done

probe() {
  timeout 240 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((512, 512), jnp.bfloat16)
assert jax.devices()[0].platform == "tpu"
(x @ x).sum().block_until_ready()
EOF
}
until probe; do
  echo "$(date -u +%T) r4d: tpu probe failed; retry in 60s" >> $LOG/queue.log
  sleep 60
done
echo "$(date -u +%T) r4d queue start" >> $LOG/queue.log

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  [ -e "$LOG/$name.done" ] && { echo "skip $name (done)" >> $LOG/queue.log; return; }
  echo "$(date -u +%T) START $name" >> $LOG/queue.log
  timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "$(date -u +%T) END $name rc=$rc" >> $LOG/queue.log
  [ $rc -eq 0 ] && touch "$LOG/$name.done"
}

run bench_gemnet_r4d 1500 python bench.py --model gemnet_oc

run profile_gemnet_r4d 1200 python examples/profile_step.py --model gemnet_oc

if grep -q '"reached_target": false' results/acc_phisnet.json 2>/dev/null; then
  run phisnet_precision_d 4200 python examples/hamiltonian_precision.py \
      --model phisnet --state outputs/hp_phisnet_state.msgpack \
      --out results/acc_phisnet.json --schedule cosine --max-steps 12000 \
      --target 1.9e-4
fi

run qhnet_precision_r4d 6000 python examples/hamiltonian_precision.py \
    --model qhnet --state outputs/hp_qhnet_state.msgpack \
    --out results/acc_qhnet_r4.json --schedule cosine --max-steps 20000 \
    --target 1e-4

run profile_dimenetpp_r4d 1200 python examples/profile_step.py --model dimenetpp

echo "$(date -u +%T) R4D QUEUE COMPLETE" >> $LOG/queue.log
touch $LOG/R4D_ALL_DONE
