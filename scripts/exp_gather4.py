"""Why is the row gather slow in-pipeline? Test slice/transpose consumers
with and without a materialization barrier, at pipeline scale."""

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
S, C = 32, K // 32
PT = 16

rng = np.random.default_rng(0)
idx = jax.device_put(jnp.asarray(rng.integers(0, N, K, dtype=np.int32)))
tab = jax.jit(lambda k: jax.random.bits(k, (N, 128), dtype=jnp.uint32))(
    jax.random.key(1)
)
tab.block_until_ready()


def timeit(name, fn, *args):
    print(f"... {name}", file=sys.stderr, flush=True)
    jitted = jax.jit(fn, static_argnums=(len(args),))

    def run(reps):
        t0 = time.perf_counter()
        out = jitted(*args, reps)
        np.asarray(out)
        return time.perf_counter() - t0

    run(1)
    t1 = run(1)
    t3 = run(3)
    ms = (t3 - t1) / 2 * 1e3
    print(f"{name:44s} {ms:8.2f} ms", flush=True)


def loop(body, reps):
    return jax.lax.fori_loop(0, reps, body, jnp.uint32(0))


def full_sum(t, ix, reps):
    def body(i, acc):
        j = (ix + i) & (N - 1)
        return acc + t[j, :].sum(dtype=jnp.uint32)
    return loop(body, reps)


def barrier_slice_t(t, ix, reps):
    def body(i, acc):
        j = (ix + i) & (N - 1)
        rows = jax.lax.optimization_barrier(t[j, :])
        out = rows[:, :PT].reshape(S, C, PT).transpose(0, 2, 1)
        return acc + out.sum(dtype=jnp.uint32)
    return loop(body, reps)


def fused_slice_t(t, ix, reps):
    def body(i, acc):
        j = (ix + i) & (N - 1)
        out = t[j, :PT].reshape(S, C, PT).transpose(0, 2, 1)
        return acc + out.sum(dtype=jnp.uint32)
    return loop(body, reps)


timeit("take [N,128] full sum", full_sum, tab, idx)
timeit("take -> BARRIER -> slice16+transpose", barrier_slice_t, tab, idx)
timeit("take fused slice16+transpose", fused_slice_t, tab, idx)
