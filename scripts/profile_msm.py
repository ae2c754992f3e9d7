"""Stage-by-stage profiling of the msm3 pipeline on the real TPU.

Times cumulative prefixes of `_msm16_impl` with the reps-delta chained
method (see docs/PERF.md: independent dispatches pipeline/dedupe through
the axon tunnel, so every iteration must consume the previous one's
output). Deltas between consecutive prefixes give per-stage cost.
"""
import functools
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


def main():
    t0 = time.time()
    print(f"[{time.time()-t0:6.1f}s] SRS generate 2^{MSM_N.bit_length()-1}")
    setup = Setup.generate(MSM_N, srs_cache=os.path.join(HERE, ".srs_cache"))
    eng = setup.msm_engine
    eng._build_affine16()
    tab = eng.affine16_tab
    print(f"[{time.time()-t0:6.1f}s] tables ready; tab shape {tab.shape}")

    k = msm3.NW * MSM_N
    S, C, kpad = msm3._plan(k)
    T = min(msm3._pow2_at_least(msm3.NBUCKET + C + 1), kpad)
    T2 = min(msm3._pow2_at_least(msm3.NBUCKET + T // 16 + 1), T)
    print(f"K={k} S={S} C={C} T={T} T2={T2}")

    rng = np.random.default_rng(7)
    from plonkathon_tpu.fields import FR_MOD

    vals = [
        (int(a) * int(b) * 7 + int(a)) % FR_MOD
        for a, b in zip(
            rng.integers(0, 1 << 62, MSM_N, dtype=np.uint64),
            rng.integers(0, 1 << 62, MSM_N, dtype=np.uint64),
        )
    ]
    coeffs = jnp.asarray(fr.to_mont_host_many(vals))

    # ---- pipeline prefixes ------------------------------------------------
    def p_digits(tab, carry):
        key, payload = msm3.signed_digits16(fr.from_mont(carry), MSM_N)
        return key + payload

    def _kp(carry):
        key, payload = msm3.signed_digits16(fr.from_mont(carry), MSM_N)
        return key, payload

    def p_sort(tab, carry):
        key, payload = _kp(carry)
        skey, spay = jax.lax.sort_key_val(key, payload)
        return skey + spay

    def _sorted_sm(carry):
        key, payload = _kp(carry)
        skey, spay = jax.lax.sort_key_val(key, payload)
        ksm = msm3._step_major(skey, S, C)
        psm = msm3._step_major(spay, S, C)
        return ksm, psm

    def p_perm(tab, carry):
        ksm, psm = _sorted_sm(carry)
        return ksm + psm

    def p_gather(tab, carry):
        ksm, psm = _sorted_sm(carry)
        sidx = psm >> 1
        rows = tab[sidx.reshape(-1)]
        return rows[:, 0].reshape(S, C) + ksm

    def _pts_sm(tab, carry):
        ksm, psm = _sorted_sm(carry)
        sidx = psm >> 1
        rows = tab[sidx.reshape(-1)]
        pts_sm = (
            rows[:, : msm3.PACKED_PT]
            .reshape(S, C, msm3.PACKED_PT)
            .transpose(0, 2, 1)
        )
        return ksm, psm, pts_sm

    def p_transpose(tab, carry):
        ksm, psm, pts_sm = _pts_sm(tab, carry)
        return pts_sm[:, 0, :] + ksm

    def _scanned(tab, carry):
        ksm, psm, pts_sm = _pts_sm(tab, carry)
        fresh = jnp.concatenate(
            [jnp.ones((1, C), jnp.bool_), ksm[1:] != ksm[:-1]], axis=0
        )
        mask_sm = fresh.astype(jnp.int32) | ((psm & 1) << 1)
        ys = msm3._run_scan(pts_sm, mask_sm, S, C, "madd")
        return ksm, ys

    def p_scan(tab, carry):
        ksm, ys = _scanned(tab, carry)
        return ys[:, 0, :] + ksm.astype(jnp.uint32)

    def _extracted(tab, carry):
        ksm, ys = _scanned(tab, carry)
        return msm3._extract_sorted(ys, ksm, S, C, T)

    def p_extract(tab, carry):
        k2, p2 = _extracted(tab, carry)
        return k2 + p2[0].astype(jnp.int32)

    def p_merge(tab, carry):
        k2, p2 = _extracted(tab, carry)
        S2 = 16
        C2 = T // S2
        k2sm = msm3._step_major(k2, S2, C2)
        p2sm = msm3._step_major_pts(p2, S2, C2)
        fresh2 = jnp.concatenate(
            [jnp.ones((1, C2), jnp.bool_), k2sm[1:] != k2sm[:-1]], axis=0
        )
        ys2 = msm3._run_scan(p2sm, fresh2.astype(jnp.int32), S2, C2, "jadd")
        k3, p3 = msm3._extract_sorted(ys2, k2sm, S2, C2, T2)
        return k3 + p3[0].astype(jnp.int32)

    def p_full(tab, carry):
        key, payload = _kp(carry)
        res, _mm = msm3._msm16_impl(
            tab, key, payload, S=S, C=C, T=T, T2=T2, J=msm3._J
        )
        return res

    stages = [
        ("digits", p_digits),
        ("sort", p_sort),
        ("perm", p_perm),
        ("gather", p_gather),
        ("transpose", p_transpose),
        ("scan", p_scan),
        ("extract", p_extract),
        ("merge", p_merge),
        ("full", p_full),
    ]

    def make_chain(fn):
        def chain(tab, cc, reps):
            def body(_, carry):
                out = fn(tab, carry)
                h = out.reshape(-1)[:1].astype(jnp.uint32) & 0xFFFF
                return fr.add(carry, jnp.tile(h, (16, 1)))

            return jax.lax.fori_loop(0, reps, body, cc)

        return jax.jit(chain, static_argnums=2)

    results = {}
    prev = 0.0
    for name, fn in stages:
        chain = make_chain(fn)

        def timed(reps):
            t = time.perf_counter()
            out = chain(tab, coeffs, reps)
            _ = np.asarray(out[:, :1])
            return time.perf_counter() - t

        tc0 = time.perf_counter()
        timed(1)
        compile_s = time.perf_counter() - tc0
        t_short = min(timed(1) for _ in range(2))
        t_long = min(timed(4) for _ in range(2))
        dt = max((t_long - t_short) / 3, 1e-9)
        results[name] = dt * 1e3
        print(
            f"[{time.time()-t0:6.1f}s] {name:10s} cum={dt*1e3:8.2f} ms  "
            f"delta={1e3*(dt-prev):8.2f} ms  (compile {compile_s:.0f}s)",
            flush=True,
        )
        prev = dt

    print("\nstage deltas (ms):")
    names = [n for n, _ in stages]
    for a, b in zip([None] + names[:-1], names):
        d = results[b] - (results[a] if a else 0.0)
        print(f"  {b:10s} {d:8.2f}")
    print(f"total {results['full']:.2f} ms -> {MSM_N/results['full']*1e3:.0f} pts/s")


if __name__ == "__main__":
    main()
