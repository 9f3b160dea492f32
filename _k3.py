import functools, numpy as np, jax, jax.numpy as jnp, time
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
B,A,K,K2,C,E = 2,8,4,4,8,64

def kern(idx_s, s8_r, xkj_r, w2_r, out_r):
    w2 = w2_r[:]
    for k in range(K):
        j = idx_s[0, pl.program_id(1), k]
        xj = xkj_r[0, j]
        t1 = jax.lax.dot_general(s8_r[0,0,k], xj, ((((0,),(0,))),((),())), preferred_element_type=jnp.float32)
        out_r[0,0,k] = jnp.sum(w2*t1, axis=0)

def run(ce):
    rng = np.random.default_rng(0)
    s8 = jnp.asarray(rng.normal(size=(B,A,K,K2,C)).astype(np.float32))
    xkj = jnp.asarray(rng.normal(size=(B,A,K2,E)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(size=(C,E)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0,A,(B,A,K)).astype(np.int32))
    out = pl.pallas_call(
        kern,
        grid=(B,A),
        in_specs=[pl.BlockSpec((1,A,K), lambda b,a:(b,0,0), memory_space=pltpu.SMEM),
                  pl.BlockSpec((1,1,K,K2,C), lambda b,a:(b,a,0,0,0)),
                  pl.BlockSpec((1,A,K2,E), lambda b,a:(b,0,0,0)),
                  pl.BlockSpec((C,E), lambda b,a:(0,0))],
        out_specs=pl.BlockSpec((1,1,K,E), lambda b,a:(b,a,0,0)),
        out_shape=jax.ShapeDtypeStruct((B,A,K,E), jnp.float32),
        cost_estimate=pl.CostEstimate(flops=2*B*A*K*K2*C*E, bytes_accessed=12345, transcendentals=0) if ce else None,
    )(idx, s8, xkj, w2)
    return float(out.sum())

t0=time.time(); print("no-ce:", run(False), round(time.time()-t0,1), flush=True)
t0=time.time(); print("ce:", run(True), round(time.time()-t0,1), flush=True)
