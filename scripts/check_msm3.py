"""Correctness + timing check for the msm3 pipeline on the real TPU.

1. Correctness at a small n against the host Pippenger oracle.
2. Full-pipeline reps-delta timing at MSM_N (default 2^18) using the
   cached synthetic SRS.
"""
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache")
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from plonkathon_tpu.kzg import Setup
from plonkathon_tpu.ops.limbs import fr
from plonkathon_tpu.ops import msm3

MSM_N = int(os.environ.get("MSM_N", 1 << 18))
SMALL_N = int(os.environ.get("SMALL_N", 1 << 12))


def rand_fr(rng, n):
    from plonkathon_tpu.fields import FR_MOD

    lo = rng.integers(0, 1 << 62, size=n, dtype=np.uint64)
    hi = rng.integers(0, 1 << 62, size=n, dtype=np.uint64)
    return [(int(a) * int(b) * 7 + int(a)) % FR_MOD for a, b in zip(lo, hi)]


def main():
    t0 = time.time()
    rng = np.random.default_rng(11)

    # ---- 1. correctness at SMALL_N vs host oracle -----------------------
    if not os.environ.get("SKIP_SMALL"):
        print(f"[{time.time()-t0:6.1f}s] small-n correctness (n={SMALL_N})")
        s_small = Setup.generate(
            SMALL_N, srs_cache=os.path.join(HERE, ".srs_cache")
        )
        eng = s_small.msm_engine
        vals = rand_fr(rng, SMALL_N)
        coeffs = jnp.asarray(fr.to_mont_host_many(vals))
        got = eng.commit_mont(coeffs)  # routes through msm3 on TPU
        from plonkathon_tpu import ec
        from plonkathon_tpu.fields import Fr

        want = ec.ec_lincomb(
            list(zip(s_small.powers_of_x[:SMALL_N], [Fr(v) for v in vals]))
        )
        assert got == want, f"msm3 MISMATCH at n={SMALL_N}: {got} != {want}"
        print(f"[{time.time()-t0:6.1f}s] small-n OK")

    # ---- 2. timing at MSM_N --------------------------------------------
    setup = Setup.generate(MSM_N, srs_cache=os.path.join(HERE, ".srs_cache"))
    engb = setup.msm_engine
    engb._build_affine16()
    tab = engb.affine16_tab
    k = msm3.NW * MSM_N
    S, C, kpad = msm3._plan(k)
    T = min(msm3._pow2_at_least(msm3.NBUCKET + C + 1), kpad)
    T2 = min(msm3._pow2_at_least(msm3.NBUCKET + T // 16 + 1), T)
    coeffs = jnp.asarray(fr.to_mont_host_many(rand_fr(rng, MSM_N)))

    def msm_chain(tabp, cc, reps):
        def body(_, carry):
            key, payload = msm3.signed_digits16(fr.from_mont(carry), MSM_N)
            res, _mm = msm3._msm16_impl(
                tabp, key, payload, S=S, C=C, T=T, T2=T2, J=msm3._J
            )
            return fr.add(carry, res[:16][:, None])

        return jax.lax.fori_loop(0, reps, body, cc)

    chain = jax.jit(msm_chain, static_argnums=2)

    def timed(reps):
        t = time.perf_counter()
        out = chain(tab, coeffs, reps)
        _ = np.asarray(out[:, :1])
        return time.perf_counter() - t

    print(f"[{time.time()-t0:6.1f}s] compiling full pipeline at n={MSM_N}")
    timed(1)
    t_short = min(timed(1) for _ in range(2))
    t_long = min(timed(5) for _ in range(2))
    dt = max((t_long - t_short) / 4, 1e-9)
    print(
        f"[{time.time()-t0:6.1f}s] msm3 full: {dt*1e3:.2f} ms "
        f"-> {MSM_N/dt:,.0f} pts/s"
    )


if __name__ == "__main__":
    main()
