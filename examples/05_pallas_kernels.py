"""The three fused Pallas solve kernels, used directly.

On a TPU this runs the hot path the flagship bench rides (compiled
kernels); elsewhere it demonstrates the same APIs via the Adam kernel's
interpreter mode and the df64 library (the LM/polish kernels are
compiled-only — see ops/pallas_chain.py).
"""
import os, sys; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from slam_decomposition_tpu.models import gates
from slam_decomposition_tpu.models.templates import build_ansatz, cycle_gates
from slam_decomposition_tpu.opt.samplers import haar_sample
from slam_decomposition_tpu.ops import cplx, df64
from slam_decomposition_tpu.ops.pallas_chain import (
    make_adam_chain,
    make_lm_chain,
    make_polish_chain,
)

on_tpu = jax.default_backend() == "tpu"
a = build_ansatz(cycle_gates([gates.SQISWAP], 2))
L = 1024 if on_tpu else 8
tp = cplx.from_numpy(haar_sample(L, seed=3))
t32 = (tp[0].astype(jnp.float32), tp[1].astype(jnp.float32))
x0 = (
    jax.random.uniform(jax.random.PRNGKey(0), (L, a.n_params)).astype(jnp.float32)
    * 2
    * np.pi
)


def costs(x):
    V = jax.vmap(a.eval_fn)(jnp.asarray(x, jnp.float64))
    tr = cplx.trace(cplx.matmul(cplx.dagger(tp), V))
    return np.asarray(1.0 - (cplx.abs2(tr) + 4.0) / 20.0)


# 1. fused Adam warm start (100 iterations on-chip)
adam = make_adam_chain(a.chain_gates, interpret=not on_tpu, sublanes=32 if on_tpu else 8)
xa = adam(x0, *t32)
print(f"after Adam kernel:   median cost {np.median(costs(xa)):.2e}")

if on_tpu:
    # 2. fused f32 LM ranking pass
    xl, fl = make_lm_chain(a.chain_gates)(xa, *t32)
    print(f"after LM kernel:     median cost {np.median(costs(xl)):.2e}")
    # 3. double-single polish (residual at ~2^-47 without f64 hardware)
    xp = make_polish_chain(a.chain_gates)(jnp.asarray(xl, jnp.float64), tp[0], tp[1])
    c = costs(xp)
    basin = costs(xl) < 1e-4
    print(
        f"after df64 polish:   median cost {np.median(c[basin]):.2e} "
        f"on {basin.sum()} in-basin lanes (certified in true f64)"
    )

# the double-single library itself
x = df64.from_f64(jnp.asarray(np.linspace(0.1, 6.2, 5)))
s, c_ = df64.sincos(x)
print("df64 sin errors vs numpy f64:",
      np.abs(np.asarray(df64.to_f64(s)) - np.sin(np.linspace(0.1, 6.2, 5))).max())
