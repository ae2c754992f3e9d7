"""Validate + time the row-layout msm3 gather on the real chip.

1. Correctness: engine.commit_mont (msm3 rows) vs the msm2 8-bit pipeline
   at m=8192.
2. Speed: driver-style chained MSM rate at m=2^18.
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
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from plonkathon_tpu.kzg import Setup
from plonkathon_tpu.fields import FR_MOD
from plonkathon_tpu.ops.limbs import fr
from plonkathon_tpu.ops import msm3

rng = np.random.default_rng(7)


def rand_coeffs(m):
    vals = [int(x) for x in rng.integers(0, 1 << 62, m)]
    vals = [(v * v * v + 11) % FR_MOD for v in vals]
    return jnp.asarray(fr.to_mont_host_many(vals))


# --- correctness at m=8192 ------------------------------------------------
t0 = time.time()
setup = Setup.generate(8192, srs_cache=os.path.join(HERE, ".srs_cache"))
eng = setup.msm_engine
print(f"srs 8192: {time.time()-t0:.1f}s", flush=True)
c = rand_coeffs(8192)
p_rows = eng.commit_mont(c)          # msm3, row-layout table
p_msm2 = eng._commit_msm2(c)         # 8-bit pipeline
assert p_rows == p_msm2, f"row-layout msm3 mismatch: {p_rows} vs {p_msm2}"
print("correctness at m=8192: OK", flush=True)

# --- speed at m=2^18 ------------------------------------------------------
m = 1 << 18
t0 = time.time()
setup18 = Setup.generate(m, srs_cache=os.path.join(HERE, ".srs_cache"))
eng18 = setup18.msm_engine
eng18._build_affine16()
print(f"srs 2^18: {time.time()-t0:.1f}s  tab {eng18.affine16_tab.shape}",
      flush=True)

k = msm3.NW * m
S, C, kpad = msm3._plan(k)
T = min(msm3._pow2_at_least(msm3.NBUCKET + C + 1), kpad)
T2 = min(msm3._pow2_at_least(msm3.NBUCKET + T // 16 + 1), T)


def msm_chain(tabp, cc, reps):
    def body(_, carry):
        key, payload = msm3.signed_digits16(fr.from_mont(carry), m)
        res, _mm = msm3._msm16_impl(
            tabp, key, payload, S=S, C=C, T=T, T2=T2, J=msm3._J
        )
        return fr.add(carry, res[:16][:, None])

    return jax.lax.fori_loop(0, reps, body, cc)


jit = jax.jit(msm_chain, static_argnums=2)
cc = rand_coeffs(m)


def run(reps):
    t0 = time.perf_counter()
    out = jit(eng18.affine16_tab, cc, reps)
    np.asarray(out)
    return time.perf_counter() - t0


run(1)
t1 = run(1)
t5 = run(5)
ms = (t5 - t1) / 4 * 1e3
print(f"msm 2^18 chained: {ms:.1f} ms  -> {m/ms*1000:,.0f} points/s",
      flush=True)
