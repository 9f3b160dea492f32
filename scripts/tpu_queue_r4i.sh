#!/bin/bash
# Round-4 TPU queue, part I (chained after r4h):
#   1. Retime the DimeNet++ bench row after the lin_ji/lin_kj double-width
#      GEMM fusion (param-tree-identical; parity/converter tests green).
#   2. Keep resuming the QHNet precision run (state-checkpointed) until
#      reached_target or 3 more chunks are spent.
cd /root/repo
LOG=outputs/tpu_queue
mkdir -p $LOG

while [ ! -e "$LOG/R4H_ALL_DONE" ]; do
  sleep 60
done

probe() {
  timeout 240 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((512, 512), jnp.bfloat16)
assert jax.devices()[0].platform == "tpu"
(x @ x).sum().block_until_ready()
EOF
}
until probe; do
  echo "$(date -u +%T) r4i: tpu probe failed; retry in 60s" >> $LOG/queue.log
  sleep 60
done
echo "$(date -u +%T) r4i queue start" >> $LOG/queue.log

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  [ -e "$LOG/$name.done" ] && { echo "skip $name (done)" >> $LOG/queue.log; return; }
  echo "$(date -u +%T) START $name" >> $LOG/queue.log
  timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "$(date -u +%T) END $name rc=$rc" >> $LOG/queue.log
  [ $rc -eq 0 ] && touch "$LOG/$name.done"
}

run bench_dimenetpp_fused 1200 python bench.py --model dimenetpp

# speed-of-light table: flops/bytes vs measured matmul+HBM ceilings per row
run roofline_report 3600 python examples/roofline_report.py --all

qhnet_done() {
  python - <<'EOF'
import json, sys
try:
    d = json.load(open("results/acc_qhnet_r4.json"))
except Exception:
    sys.exit(1)
sys.exit(0 if d.get("reached_target") else 1)
EOF
}
for i in 1 2 3; do
  qhnet_done && { echo "$(date -u +%T) r4i: qhnet target reached" >> $LOG/queue.log; break; }
  run qhnet_precision_r4i$i 6000 python examples/hamiltonian_precision.py \
      --model qhnet --state outputs/hp_qhnet_state.msgpack \
      --out results/acc_qhnet_r4.json --schedule cosine --max-steps 20000 \
      --target 1e-4
done

touch $LOG/R4I_ALL_DONE
echo "$(date -u +%T) R4I QUEUE COMPLETE" >> $LOG/queue.log
