#!/bin/bash
# Round-4 TPU queue, part F. Waits for the in-flight DimeNet++ profile
# (PID in /tmp/profile_dimenetpp.pid) to exit, then:
#   1. DimeNet++ bench batch sweep (B=64, B=96) — padding/utilization
#      amortization is the cheapest lever on the 0.775x row.
#   2. QHNet precision resume to 1e-4 (VERDICT #5).
cd /root/repo
LOG=outputs/tpu_queue
mkdir -p $LOG

if [ -f /tmp/profile_dimenetpp.pid ]; then
  P=$(cat /tmp/profile_dimenetpp.pid)
  while kill -0 "$P" 2>/dev/null; do sleep 20; done
fi

probe() {
  timeout 240 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((512, 512), jnp.bfloat16)
assert jax.devices()[0].platform == "tpu"
(x @ x).sum().block_until_ready()
EOF
}
until probe; do
  echo "$(date -u +%T) r4f: tpu probe failed; retry in 60s" >> $LOG/queue.log
  sleep 60
done
echo "$(date -u +%T) r4f queue start" >> $LOG/queue.log

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  [ -e "$LOG/$name.done" ] && { echo "skip $name (done)" >> $LOG/queue.log; return; }
  echo "$(date -u +%T) START $name" >> $LOG/queue.log
  timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "$(date -u +%T) END $name rc=$rc" >> $LOG/queue.log
  [ $rc -eq 0 ] && touch "$LOG/$name.done"
}

run bench_dimenetpp_b64 1200 env NABLA_BENCH_BATCH=64 python bench.py --model dimenetpp
run bench_dimenetpp_b96 1200 env NABLA_BENCH_BATCH=96 python bench.py --model dimenetpp

run qhnet_precision_r4e 6000 python examples/hamiltonian_precision.py \
    --model qhnet --state outputs/hp_qhnet_state.msgpack \
    --out results/acc_qhnet_r4.json --schedule cosine --max-steps 20000 \
    --target 1e-4

touch $LOG/R4F_ALL_DONE
echo "$(date -u +%T) R4F QUEUE COMPLETE" >> $LOG/queue.log
