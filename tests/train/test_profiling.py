"""Roofline probes (train/profiling.py): cost-analysis readers and the
measured-ceiling probes behind bench.py's peak_tflops fields and
examples/roofline_report.py."""

import jax
import jax.numpy as jnp

from nabladft_tpu.train.profiling import (
    compiled_bytes,
    compiled_flops,
    measured_hbm_bandwidth,
    measured_peak_flops,
)


def test_compiled_flops_counts_the_matmul():
    n = 128
    f = jax.jit(lambda a, b: jnp.sum(a @ b))
    x = jnp.ones((n, n), jnp.float32)
    flops = compiled_flops(f, x, x)
    assert flops is not None
    # 2n^3 for the dot (the reduction sum is O(n^2) noise)
    assert flops >= 2 * n**3
    assert flops <= 2.5 * n**3


def test_compiled_bytes_covers_operands():
    n = 256
    f = jax.jit(lambda a, b: a @ b)
    x = jnp.ones((n, n), jnp.float32)
    nbytes = compiled_bytes(f, x, x)
    assert nbytes is not None
    # at least the two operands and the output must cross HBM
    assert nbytes >= 3 * n * n * 4


def test_measured_ceilings_positive_and_finite():
    peak = measured_peak_flops("float32", n=256, iters=2)
    bw = measured_hbm_bandwidth(n_bytes=1 << 22, iters=2)
    assert 0 < peak < 1e16
    assert 0 < bw < 1e14
