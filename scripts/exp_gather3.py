"""Isolate: device_put [N,128] vs on-device-generated [N,128] take."""

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
    print(f"{name:40s} {ms:8.2f} ms", flush=True)


def g_sub(tab, ix, reps):
    def body(i, acc):
        j = (ix + i) & (N - 1)
        return acc + tab[j, :].sum(dtype=jnp.uint32)
    return jax.lax.fori_loop(0, reps, body, jnp.uint32(0))


tab_put = jax.device_put(
    jnp.asarray(np.ascontiguousarray(np.pad(tab_np.T, ((0, 0), (0, 112)))))
)
timeit("device_put pad [N,128]", g_sub, tab_put, idx)

tab_gen = jax.jit(
    lambda k: jax.random.bits(k, (N, 128), dtype=jnp.uint32)
)(jax.random.key(1))
tab_gen.block_until_ready()
timeit("on-device bits [N,128]", g_sub, tab_gen, idx)

tab_gen2 = jax.jit(
    lambda t: jnp.pad(t, ((0, 0), (0, 112)))
)(jax.device_put(jnp.asarray(np.ascontiguousarray(tab_np.T))))
tab_gen2.block_until_ready()
timeit("on-device pad16->128 [N,128]", g_sub, tab_gen2, idx)
