"""Profiling, step-time and MFU accounting.

The reference has no tracing/profiling beyond a per-forward timing flag
(escn/escn.py:83, SURVEY §5); here profiling is first-class:

  * `trace(dir)` — context manager around `jax.profiler` for TensorBoard
    traces (the Trainer exposes it via TrainerConfig.profile_dir);
  * `compiled_flops(fn, *args)` — XLA's own cost analysis of a jitted
    step, used to report model FLOPs per step;
  * `mfu(flops_per_step, step_time, n_devices)` — model FLOPs utilization
    against the device generation's peak.
"""

from __future__ import annotations

import contextlib
import logging
from typing import Optional

import jax

logger = logging.getLogger(__name__)

# peak dense matmul throughput per chip, FLOP/s
PEAK_FLOPS = {
    ("tpu v5 lite", "bf16"): 197e12,
    ("tpu v5 lite", "f32"): 98.5e12,
    ("tpu v5e", "bf16"): 197e12,
    ("tpu v5e", "f32"): 98.5e12,
    ("tpu v4", "bf16"): 275e12,
    ("tpu v4", "f32"): 137e12,
    ("tpu v6e", "bf16"): 918e12,
}


def device_peak_flops(dtype: str = "bf16") -> Optional[float]:
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "").lower()
    for (name, dt), peak in PEAK_FLOPS.items():
        if dt == dtype and name in kind:
            return peak
    for (name, dt), peak in PEAK_FLOPS.items():
        if dt == dtype and kind.startswith(name.split()[0]):
            return peak
    return None


def compiled_flops(jitted_fn, *args) -> Optional[float]:
    """FLOPs of one invocation from XLA cost analysis (None if unavailable)."""
    try:
        compiled = jitted_fn.lower(*args).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0)) or None
    except Exception:  # noqa: BLE001 — cost analysis is best-effort
        return None


def mfu(flops_per_step: float, step_time_s: float, n_devices: int = 1,
        dtype: str = "bf16") -> Optional[float]:
    peak = device_peak_flops(dtype)
    if peak is None or step_time_s <= 0:
        return None
    return flops_per_step / step_time_s / (peak * n_devices)


def measured_peak_flops(dtype="bfloat16", n: int = 8192, iters: int = 8) -> float:
    """Empirical dense-matmul throughput of the attached device (FLOP/s).

    Tunneled/virtualized devices (axon) can expose a fraction of a physical
    chip, so nominal PEAK_FLOPS tables overstate the achievable ceiling;
    MFU against this measured number is the honest utilization figure.
    """
    import time

    import jax.numpy as jnp

    x = jnp.ones((n, n), jnp.dtype(dtype))
    # Consume the WHOLE product: slicing [0, 0] out of the dot lets XLA's
    # algebraic simplifier rewrite slice-of-dot into a 2n-FLOP row·column
    # product, which would inflate the "measured peak" by ~n^2.
    f = jax.jit(lambda a, b: jnp.sum(a @ b, dtype=jnp.float32))
    float(f(x, x))  # compile + warm
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = f(x, x)
    float(out)  # host fetch: guarantees completion through tunneled backends
    dt = (time.perf_counter() - t0) / iters
    return 2.0 * n**3 / dt


def compiled_bytes(jitted_fn, *args) -> Optional[float]:
    """HBM bytes accessed by one invocation, from XLA cost analysis of the
    OPTIMIZED (post-fusion) HLO — the roofline bandwidth term."""
    try:
        compiled = jitted_fn.lower(*args).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("bytes accessed", 0.0)) or None
    except Exception:  # noqa: BLE001 — cost analysis is best-effort
        return None


def measured_hbm_bandwidth(n_bytes: int = 1 << 29, iters: int = 8) -> float:
    """Empirical HBM read+write bandwidth of the attached device (B/s),
    via a fused elementwise map over an n_bytes array (1 read + 1 write
    per element). Same rationale as measured_peak_flops: the tunneled
    device delivers a fluctuating fraction of a physical chip, so
    roofline math must use the measured ceiling of the same process."""
    import time

    import jax.numpy as jnp

    n = n_bytes // 4
    x = jnp.ones((n,), jnp.float32)
    f = jax.jit(lambda a: a * 1.000001 + 0.5)
    f(x).block_until_ready()  # compile + warm
    t0 = time.perf_counter()
    y = x
    for _ in range(iters):
        y = f(y)
    y.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return 2.0 * n_bytes / dt


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a TensorBoard-viewable profiler trace of the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Exponential-moving-average step timer with MFU reporting."""

    def __init__(self, decay: float = 0.9):
        self.decay = decay
        self.avg: Optional[float] = None
        self.flops: Optional[float] = None

    def update(self, dt: float) -> float:
        self.avg = dt if self.avg is None else self.decay * self.avg + (1 - self.decay) * dt
        return self.avg

    def metrics(self, batch_size: int, n_devices: int = 1) -> dict:
        out: dict = {}
        if self.avg:
            out["step_time_s"] = self.avg
            out["examples_per_sec"] = batch_size / self.avg
            if self.flops:
                u = mfu(self.flops, self.avg, n_devices)
                if u is not None:
                    out["mfu"] = u
        return out
