#!/bin/bash
# One wall-bounded slice of the QHNet precision run (VERDICT r4 #3):
# cosine-to-zero over 3000 steps (1500 epochs), state-resumed across
# slices; exits immediately once the 1e-4 target is reached.
cd /root/repo || exit 1
reached=$(python - <<'PY'
import json
try:
    d = json.load(open("results/acc_qhnet_r5.json"))
    print(d.get("reached_target") and d.get("h_mae_eh") is not None)
except Exception:
    print(False)
PY
)
if [ "$reached" = "True" ]; then
    echo "target already reached; slice is a no-op"
    exit 0
fi
exec timeout "${1:-1500}" python examples/hamiltonian_precision.py \
    --model qhnet --schedule cosine --lr 7e-4 --max-steps 3000 \
    --state outputs/hp_qhnet_state_r5.msgpack \
    --out results/acc_qhnet_r5.json --target 1e-4
