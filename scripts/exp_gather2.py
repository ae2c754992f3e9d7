"""Follow-up: row-width sweep for sublane-axis take, and slice-consumers."""

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
idx = jax.device_put(jnp.asarray(rng.integers(0, N, K, dtype=np.int32)))


def timeit(name, fn, *args):
    print(f"... {name}", file=sys.stderr, flush=True)
    jitted = jax.jit(fn, static_argnums=(len(args),))

    def run(reps):
        t0 = time.perf_counter()
        out = jitted(*args, reps)
        np.asarray(out)
        return time.perf_counter() - t0

    run(1)
    t2 = run(2)
    t6 = run(6)
    ms = (t6 - t2) / 4 * 1e3
    print(f"{name:36s} {ms:8.2f} ms", flush=True)


def _mk(key, width):
    return jax.random.bits(key, (N, width), dtype=jnp.uint32)


def make(width):
    out = jax.jit(_mk, static_argnums=1)(jax.random.key(width), width)
    out.block_until_ready()
    return out


def g_sub(tab, ix, reps):
    def body(i, acc):
        j = (ix + i) & (N - 1)
        return acc + tab[j, :].sum(dtype=jnp.uint32)
    return jax.lax.fori_loop(0, reps, body, jnp.uint32(0))


def g_sub_slice16(tab, ix, reps):
    def body(i, acc):
        j = (ix + i) & (N - 1)
        return acc + tab[j, :16].sum(dtype=jnp.uint32)
    return jax.lax.fori_loop(0, reps, body, jnp.uint32(0))


def g_sub_slice16_t(tab, ix, reps):
    S, C = 32, K // 32
    def body(i, acc):
        j = (ix + i) & (N - 1)
        out = tab[j, :16].reshape(S, C, 16).transpose(0, 2, 1)
        return acc + out.sum(dtype=jnp.uint32)
    return jax.lax.fori_loop(0, reps, body, jnp.uint32(0))


for w in (16, 32, 64):
    tab = make(w)
    timeit(f"take [N,{w}] full", g_sub, tab, idx)
    del tab

tab128 = make(128)
timeit("take [N,128] full", g_sub, tab128, idx)
timeit("take [N,128] consume [:, :16]", g_sub_slice16, tab128, idx)
timeit("take [N,128] [:, :16] + transpose", g_sub_slice16_t, tab128, idx)
