"""Benchmark: MSM commit throughput, NTT throughput, proof latency, scaling.

Runs on the default JAX platform (the real TPU under the driver; CPU as a
fallback).  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Headline: BN254 fixed-base MSM points/sec/chip (baseline target 1e7/s from
BASELINE.md), measured through the Pallas bucket pipeline (ops/msm2.py) at
n=2^14 with a synthetic known-tau SRS.  Also reports NTT butterflies/sec,
proof latency at n=2^10, per-round prover timings, and the virtual-mesh NTT
scaling efficiency (measured in a CPU subprocess; real multi-chip hardware
is not available to the bench runner).

Timing notes: on the tunneled TPU `block_until_ready` does not reliably
block, so every measurement forces a tiny host fetch; reps-delta timing
(long chain minus short chain) cancels the constant fetch latency.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import jax.numpy as jnp

_START = time.time()
_DEADLINE = float(os.environ.get("BENCH_DEADLINE_S", "1500"))


def _left() -> float:
    return _DEADLINE - (time.time() - _START)


def main():
    from plonkathon_tpu.fields import FR_MOD
    from plonkathon_tpu.kzg import Setup
    from plonkathon_tpu.ops.limbs import fr
    from plonkathon_tpu.ops import curve as _curve

    here = os.path.dirname(os.path.abspath(__file__))
    platform = jax.default_backend()
    rng = np.random.default_rng(42)
    extras = {"platform": platform}

    def rand_fr(n):
        lo = rng.integers(0, 1 << 62, size=n, dtype=np.uint64)
        hi = rng.integers(0, 1 << 62, size=n, dtype=np.uint64)
        return [(int(a) * int(b) * 7 + int(a)) % FR_MOD for a, b in zip(lo, hi)]

    # ---- MSM commit throughput ------------------------------------------
    if platform == "tpu":
        msm_n = 1 << 14
        srs_cache = os.path.join(here, ".srs_cache")
        setup_big = Setup.generate(msm_n, srs_cache=srs_cache)
        engine = setup_big.msm_engine  # builds affine window tables
        from plonkathon_tpu.ops import msm2

        tabx, taby = engine.affine_tab
        k = 32 * msm_n
        c = msm2._choose_chunks(k)
        s = k // c

        def msm_chain(coeffs, reps):
            def body(_, cc):
                digits = _curve._digits_impl(fr.from_mont(cc))
                res = msm2._msm_impl(tabx, taby, digits, c=c, s=s)  # [48]
                return fr.add(cc, res[:16][:, None])

            return jax.lax.fori_loop(0, reps, body, coeffs)

        chain = jax.jit(msm_chain, static_argnums=1)
        coeffs = jnp.asarray(fr.to_mont_host_many(rand_fr(msm_n)))

        def timed(reps):
            t0 = time.perf_counter()
            out = chain(coeffs, reps)
            _ = np.asarray(out[:, :1])
            return time.perf_counter() - t0

        timed(1)  # compile + warm
        t_short = min(timed(1) for _ in range(2))
        t_long = min(timed(5) for _ in range(2))
        msm_dt = max((t_long - t_short) / 4, 1e-9)
    else:
        msm_n = 1 << 11
        setup_small = Setup.from_file(
            os.path.join(here, "tests", "fixtures", "powersOfTau28_hez_final_11.ptau")
        )
        engine = setup_small.msm_engine
        pre = engine.precomp_for(msm_n)
        coeffs = jnp.asarray(fr.to_mont_host_many(rand_fr(msm_n)))

        def msm_chain(cc, reps):
            def body(_, carry):
                digits = _curve._digits_impl(fr.from_mont(carry))
                r = _curve._msm_kernel(pre[0], pre[1], pre[2], digits)
                return fr.add(carry, r[0][:, :1] if r[0].ndim > 1 else r[0][:, None])

            return jax.lax.fori_loop(0, reps, body, cc)

        chain = jax.jit(msm_chain, static_argnums=1)

        def timed(reps):
            t0 = time.perf_counter()
            out = chain(coeffs, reps)
            _ = np.asarray(out[:, :1])
            return time.perf_counter() - t0

        timed(1)
        t_short = min(timed(1) for _ in range(2))
        t_long = min(timed(5) for _ in range(2))
        msm_dt = max((t_long - t_short) / 4, 1e-9)

    msm_pps = msm_n / msm_dt
    extras["msm_n"] = msm_n
    extras["msm_ms"] = round(msm_dt * 1e3, 2)

    # ---- NTT throughput (size 2^18) -------------------------------------
    from plonkathon_tpu.ops.ntt import _ntt_impl

    nn = 1 << 18
    vals = jnp.asarray(
        fr.to_mont_host_many(rand_fr(1 << 14) * (nn >> 14))
    )

    def ntt_chain(x, reps):
        return jax.lax.fori_loop(0, reps, lambda i, a: _ntt_impl(a, nn, False), x)

    nchain = jax.jit(ntt_chain, static_argnums=1)

    def ntimed(reps):
        t0 = time.perf_counter()
        out = nchain(vals, reps)
        _ = np.asarray(out[:, :1])
        return time.perf_counter() - t0

    ntimed(1)
    nt_short = min(ntimed(1) for _ in range(2))
    nt_long = min(ntimed(5) for _ in range(2))
    ntt_dt = max((nt_long - nt_short) / 4, 1e-9)
    butterflies = (nn // 2) * (nn.bit_length() - 1)
    extras["ntt_butterflies_per_sec"] = round(butterflies / ntt_dt, 1)
    extras["ntt_2e18_ms"] = round(ntt_dt * 1e3, 2)

    # ---- Proof latency: n=2^10 mul-chain circuit ------------------------
    from plonkathon_tpu.frontend import Program
    from plonkathon_tpu.prover import Prover

    try:
        if _left() > 300:
            pn = 1 << 10
            setup = Setup.from_file(
                os.path.join(
                    here, "tests", "fixtures", "powersOfTau28_hez_final_11.ptau"
                )
            )
            lines = ["out public", "c1 <== a * a"]
            lines += [f"c{i} <== c{i-1} * a" for i in range(2, pn - 3)]
            lines.append(f"out <== c{pn-4} * a")
            program = Program(lines, pn)
            prover = Prover(setup, program)
            witness = program.fill_variable_assignments({"a": 3})
            prover.prove(dict(witness))  # compile + warm
            from plonkathon_tpu.utils.profiling import Timings

            prover.timings = Timings()
            t0 = time.perf_counter()
            prover.prove(dict(witness))
            extras["proof_n1024_s"] = round(time.perf_counter() - t0, 3)
            extras["proof_rounds_ms"] = {
                k: round(v * 1e3, 1) for k, v in prover.timings.sections.items()
            }
    except Exception as exc:  # noqa: BLE001 — report partial results
        extras["proof_error"] = repr(exc)[:200]

    # ---- Virtual-mesh NTT scaling (CPU subprocess) ----------------------
    try:
        if _left() > 180:
            code = (
                "import jax;"
                "jax.config.update('jax_platforms','cpu');"
                "import time,numpy as np,jax.numpy as jnp;"
                "import sys;sys.path.insert(0, %r);"
                "from plonkathon_tpu.parallel.mesh import make_mesh,NamedSharding,P;"
                "from plonkathon_tpu.parallel.sharded import sharded_ntt;"
                "from plonkathon_tpu.ops.limbs import fr;"
                "rng=np.random.default_rng(0);n1=n2=256;"
                "m=jnp.asarray(fr.to_mont_host_many([int(x) for x in rng.integers(0,1<<48,n1*n2)]).reshape(16,n1,n2));"
                "res={};\n"
                "for d in (1,2,8):\n"
                "  mesh=make_mesh(d);\n"
                "  mm=jax.device_put(m,NamedSharding(mesh,P(None,None,'shard')));\n"
                "  o=sharded_ntt(mesh,'shard',mm);_=np.asarray(o[:, :1, :1]);\n"
                "  t0=time.perf_counter();\n"
                "  for _i in range(3): o=sharded_ntt(mesh,'shard',mm)\n"
                "  _=np.asarray(o[:, :1, :1]);res[d]=(time.perf_counter()-t0)/3\n"
                "print('SCALING', res[1], res[2], res[8])"
            ) % (here,)
            env = dict(os.environ)
            env["XLA_FLAGS"] = (
                env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
            )
            out = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True,
                text=True,
                timeout=max(60, min(_left() - 60, 600)),
                env=env,
            )
            for line in out.stdout.splitlines():
                if line.startswith("SCALING"):
                    _, t1, t2, t8 = line.split()
                    extras["ntt_scaling_eff_2dev"] = round(float(t1) / (2 * float(t2)), 3)
                    extras["ntt_scaling_eff_8dev"] = round(float(t1) / (8 * float(t8)), 3)
    except Exception as exc:  # noqa: BLE001
        extras["scaling_error"] = repr(exc)[:200]

    baseline_msm = 1e7  # points/sec/chip target from BASELINE.md
    print(
        json.dumps(
            {
                "metric": "msm_points_per_sec_per_chip",
                "value": round(msm_pps, 1),
                "unit": "points/s",
                "vs_baseline": round(msm_pps / baseline_msm, 4),
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
