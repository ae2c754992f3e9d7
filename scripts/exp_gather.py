"""On-chip experiment: which gather formulation is fastest on TPU?

Candidates for the msm3 base gather (the pipeline's wall at ~105 ms of
190 ms end-to-end, measured 560M u32/s lane-axis):
  a) lane-axis gather (current): tab [16, N], tab[:, idx]
  b) sublane-axis take: tab [N, 16], tab[idx, :]
  c) sublane-axis take, padded rows: tab [N, 128], tab[idx, :]
  d) sublane-axis take + minor transpose back to [16, K] scan layout
"""

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache")
)

N = 1 << 22
K = 1 << 22

rng = np.random.default_rng(0)
tab_np = rng.integers(0, 2**32, (16, N), dtype=np.uint32)
idx_np = rng.integers(0, N, K, dtype=np.int32)

tab_lane = jax.device_put(jnp.asarray(tab_np))
tab_sub = jax.device_put(jnp.asarray(np.ascontiguousarray(tab_np.T)))
tab_pad = jax.device_put(
    jnp.asarray(np.ascontiguousarray(
        np.pad(tab_np.T, ((0, 0), (0, 112)))))
)
idx = jax.device_put(jnp.asarray(idx_np))


def timeit(name, fn, *args):
    jitted = jax.jit(fn, static_argnums=(len(args),))

    def run(reps):
        t0 = time.perf_counter()
        out = jitted(*args, reps)
        np.asarray(out)
        return time.perf_counter() - t0

    run(1)  # compile
    t2 = run(2)
    t6 = run(6)
    ms = (t6 - t2) / 4 * 1e3
    rate = 16 * K / ((t6 - t2) / 4) / 1e6
    print(f"{name:28s} {ms:8.2f} ms   {rate:9.1f} M-u32/s", flush=True)


def g_lane(tab, ix, reps):
    def body(i, acc):
        j = (ix + i) & (N - 1)
        return acc + tab[:, j].sum(dtype=jnp.uint32)
    return jax.lax.fori_loop(0, reps, body, jnp.uint32(0))


def g_sub(tab, ix, reps):
    def body(i, acc):
        j = (ix + i) & (N - 1)
        return acc + tab[j, :].sum(dtype=jnp.uint32)
    return jax.lax.fori_loop(0, reps, body, jnp.uint32(0))


def g_sub_t(tab, ix, reps):
    S, C = 32, K // 32
    def body(i, acc):
        j = (ix + i) & (N - 1)
        out = tab[j, :].reshape(S, C, 16).transpose(0, 2, 1)
        return acc + out.sum(dtype=jnp.uint32)
    return jax.lax.fori_loop(0, reps, body, jnp.uint32(0))


timeit("a) lane-axis [16,N] (cur)", g_lane, tab_lane, idx)
timeit("b) sublane take [N,16]", g_sub, tab_sub, idx)
timeit("c) sublane take [N,128]", g_sub, tab_pad, idx)
timeit("d) sublane take+transpose", g_sub_t, tab_sub, idx)
