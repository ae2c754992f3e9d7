"""Benchmark: MSM commit throughput, NTT throughput, proof latency, scaling.

Runs on the default JAX platform (the real TPU under the driver; CPU as a
fallback).  Prints a cumulative JSON line after EVERY section, so a crash in
a later section can never erase earlier measurements — the LAST JSON line on
stdout is always the most complete result (round 2 lost its only TPU numbers
to a late-section crash; never again).

Sections:
  1. MSM commit throughput (headline; BASELINE.md target 1e7 points/s/chip)
  2. Pallas-vs-XLA self-check (mont_mul and full MSM cross-validation on
     the real chip — the CPU test suite cannot reach the Pallas kernels)
  3. NTT throughput at 2^18
  4. Proof latency at n=2^10 (ceremony SRS) with per-round timings
  5. Full proof at n=2^18 (synthetic SRS) — beyond the reference's ceiling
  6. Virtual-mesh NTT scaling efficiency (CPU subprocess)

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

HERE = os.path.dirname(os.path.abspath(__file__))
PTAU = os.path.join(HERE, "tests", "fixtures", "powersOfTau28_hez_final_11.ptau")
BASELINE_MSM = 1e7  # points/sec/chip target from BASELINE.md


def _left() -> float:
    return _DEADLINE - (time.time() - _START)


class Report:
    """Cumulative result sink; re-emits the full JSON line after each update."""

    def __init__(self):
        self.headline = {"metric": "msm_points_per_sec_per_chip", "value": 0.0,
                         "unit": "points/s", "vs_baseline": 0.0}
        self.extras = {"platform": jax.default_backend()}

    def set_headline(self, pps: float):
        self.headline["value"] = round(pps, 1)
        self.headline["vs_baseline"] = round(pps / BASELINE_MSM, 4)

    def update(self, **kv):
        self.extras.update(kv)
        self.emit()

    def emit(self):
        print(json.dumps({**self.headline, **self.extras}), flush=True)

    def note(self, msg: str):
        print(f"[bench {time.time()-_START:7.1f}s] {msg}", file=sys.stderr, flush=True)


def rand_fr(rng, n):
    from plonkathon_tpu.fields import FR_MOD

    lo = rng.integers(0, 1 << 62, size=n, dtype=np.uint64)
    hi = rng.integers(0, 1 << 62, size=n, dtype=np.uint64)
    return [(int(a) * int(b) * 7 + int(a)) % FR_MOD for a, b in zip(lo, hi)]


def _delta_time(run, reps_long=5):
    """Min-of-2 reps-delta timing: (t(reps_long) - t(1)) / (reps_long - 1)."""
    t_short = min(run(1) for _ in range(2))
    t_long = min(run(reps_long) for _ in range(2))
    return max((t_long - t_short) / (reps_long - 1), 1e-9)


def section_msm(rep: Report, rng, setup_big, msm_n):
    from plonkathon_tpu.ops.limbs import fr
    from plonkathon_tpu.ops import curve as _curve

    platform = jax.default_backend()
    engine = setup_big.msm_engine
    coeffs = jnp.asarray(fr.to_mont_host_many(rand_fr(rng, msm_n)))

    # NB: the window tables MUST be explicit jit arguments — a closure
    # capture inlines them into the HLO as constants (256 MB at n=2^16),
    # which breaks the tunneled remote compile with HTTP 413.
    if platform == "tpu":
        from plonkathon_tpu.ops import msm3

        engine._build_affine16()
        tabs = (engine.affine16_tab, engine.affine16_tab)
        k = msm3.NW * msm_n
        S, C, kpad = msm3._plan(k)
        T = min(msm3._pow2_at_least(msm3.NBUCKET + C + 1), kpad)
        T2 = min(msm3._pow2_at_least(msm3.NBUCKET + T // 16 + 1), T)

        def msm_chain(tabp, _unused, cc, reps):
            def body(_, carry):
                key, payload = msm3.signed_digits16(fr.from_mont(carry), msm_n)
                res, _mm = msm3._msm16_impl(
                    tabp, key, payload, S=S, C=C, T=T, T2=T2, J=msm3._J
                )
                return fr.add(carry, res[:16][:, None])

            return jax.lax.fori_loop(0, reps, body, cc)
    else:
        tabs = engine.precomp_for(msm_n)[:2]
        preZ = engine.precomp_for(msm_n)[2]

        def msm_chain(preX, preY, cc, reps):
            def body(_, carry):
                digits = _curve._digits_impl(fr.from_mont(carry))
                r = _curve._msm_kernel(preX, preY, preZ, digits)
                return fr.add(carry, r[0][:, None])

            return jax.lax.fori_loop(0, reps, body, cc)

    chain = jax.jit(msm_chain, static_argnums=3)

    def timed(reps):
        t0 = time.perf_counter()
        out = chain(tabs[0], tabs[1], coeffs, reps)
        _ = np.asarray(out[:, :1])
        return time.perf_counter() - t0

    rep.note(f"msm: compiling at n=2^{msm_n.bit_length()-1}")
    timed(1)  # compile + warm
    msm_dt = _delta_time(timed)
    rep.set_headline(msm_n / msm_dt)
    rep.update(msm_n=msm_n, msm_ms=round(msm_dt * 1e3, 2))


def section_selfcheck(rep: Report, rng):
    """Pallas kernels vs the XLA fallbacks, on the real chip.

    The CPU test suite never executes ops/pallas_mont.py or the msm2
    pipeline (they require the TPU backend); this is their correctness
    evidence.  Checks (a) a wide mont_mul batch and (b) a full fixed-base
    MSM, Pallas vs XLA, exact equality.
    """
    from plonkathon_tpu.ops.limbs import fr, fq
    from plonkathon_tpu.ops import pallas_mont as PM
    from plonkathon_tpu.ops import curve as _curve
    from plonkathon_tpu.ops import msm2
    from plonkathon_tpu.kzg import Setup

    # (a) field multiply: Pallas vs XLA schoolbook on 4096 lanes.
    a = jnp.asarray(fr.to_mont_host_many(rand_fr(rng, 4096)))
    b = jnp.asarray(fr.to_mont_host_many(rand_fr(rng, 4096)))
    got = fr.from_mont_host_many(fr.canon(PM.mont_mul("fr", a, b)))
    want = fr.from_mont_host_many(fr.canon(jax.jit(fr._mul_xla)(a, b)))
    assert got == want, "pallas mont_mul != XLA mont_mul"

    # (b) full MSM: Pallas msm2 pipeline vs XLA sorted run-scan, same SRS.
    m = 512
    setup = Setup.from_file(PTAU)
    pts = setup.powers_of_x[:m]
    eng = _curve.FixedBaseMSM(pts)  # TPU backend -> affine tables
    coeffs = jnp.asarray(fr.to_mont_host_many(rand_fr(rng, m)))
    digits = _curve._coeff_digits(coeffs)
    res48 = msm2.msm_fixed_affine(eng.affine_tab[0], eng.affine_tab[1], digits)
    got_pt = _curve.jac_to_affine_host(
        (res48[:16], res48[16:32], res48[32:])
    )
    eng._build_jacobian()
    # Force the reference MSM to trace PURE XLA field ops (fq.mul would
    # otherwise route wide batches back into Pallas, weakening the check).
    from plonkathon_tpu.ops import limbs as _limbs

    saved, _limbs._PALLAS_MIN_WIDTH = _limbs._PALLAS_MIN_WIDTH, 1 << 60
    try:
        want_jac = jax.jit(_curve._msm_kernel)(
            eng.precomp[0], eng.precomp[1], eng.precomp[2], digits
        )
    finally:
        _limbs._PALLAS_MIN_WIDTH = saved
    want_pt = _curve.jac_to_affine_host(want_jac)
    assert got_pt == want_pt, "pallas MSM != XLA MSM"

    # (c) msm3 (signed 16-bit pipeline) vs msm2 (8-bit pipeline) at its
    # minimum routed size — closes the chain msm3 == msm2 == XLA.
    from plonkathon_tpu.ops import msm3

    m3 = _curve.FixedBaseMSM._MSM3_MIN
    setup3 = Setup.generate(m3, srs_cache=os.path.join(HERE, ".srs_cache"))
    eng3 = setup3.msm_engine
    coeffs3 = jnp.asarray(fr.to_mont_host_many(rand_fr(rng, m3)))
    got3 = eng3.commit_mont(coeffs3)  # routes through msm3
    eng3._build_affine()
    digits3 = _curve._coeff_digits(coeffs3)
    res3 = msm2.msm_fixed_affine(
        eng3.affine_tab[0], eng3.affine_tab[1], digits3
    )
    want3 = _curve.jac_to_affine_host((res3[:16], res3[16:32], res3[32:]))
    assert got3 == want3, "msm3 != msm2"
    rep.update(pallas_selfcheck="ok")


def section_ntt(rep: Report, rng):
    from plonkathon_tpu.ops.limbs import fr
    from plonkathon_tpu.ops.ntt import _ntt_impl

    # 2^18 for continuity with earlier rounds, then the BASELINE.md headline
    # size ("NTT butterflies/sec at 2^20 gates"); butterflies/s is reported
    # from the largest size measured.
    for nn, tag in (((1 << 18), "ntt_2e18_ms"), ((1 << 20), "ntt_2e20_ms")):
        vals = jnp.asarray(
            fr.to_mont_host_many(rand_fr(rng, 1 << 14) * (nn >> 14))
        )

        def ntt_chain(x, reps, _nn=nn):
            return jax.lax.fori_loop(
                0, reps, lambda i, a: _ntt_impl(a, _nn, False), x
            )

        nchain = jax.jit(ntt_chain, static_argnums=1)

        def ntimed(reps, _nchain=nchain, _vals=vals):
            t0 = time.perf_counter()
            out = _nchain(_vals, reps)
            _ = np.asarray(out[:, :1])
            return time.perf_counter() - t0

        rep.note(f"ntt: compiling at 2^{nn.bit_length() - 1}")
        ntimed(1)
        ntt_dt = _delta_time(ntimed)
        butterflies = (nn // 2) * (nn.bit_length() - 1)
        rep.update(
            ntt_butterflies_per_sec=round(butterflies / ntt_dt, 1),
            **{tag: round(ntt_dt * 1e3, 2)},
        )
        if _left() < 180:
            break


def _chain_lines(pn):
    lines = ["out public", "c1 <== a * a"]
    lines += [f"c{i} <== c{i-1} * a" for i in range(2, pn - 3)]
    lines.append(f"out <== c{pn-4} * a")
    return lines


def section_proof(rep: Report, setup, pn, label):
    from plonkathon_tpu.frontend import Program
    from plonkathon_tpu.prover import Prover
    from plonkathon_tpu.utils.profiling import Timings

    rep.note(f"proof {label}: building circuit")
    program = Program(_chain_lines(pn), pn)
    prover = Prover(setup, program)
    witness = program.fill_variable_assignments({"a": 3})
    rep.note(f"proof {label}: compile+warm prove")
    prover.prove(dict(witness))  # compile + warm
    prover.timings = Timings()
    t0 = time.perf_counter()
    prover.prove(dict(witness))
    dt = time.perf_counter() - t0
    rep.update(**{
        f"proof_{label}_s": round(dt, 3),
        f"proof_{label}_rounds_ms": {
            k: round(v * 1e3, 1) for k, v in prover.timings.sections.items()
        },
    })
    return dt


def section_turbo(rep: Report, setup, pn):
    """TurboPlonK custom gates + PlonKup lookups at 2^18 (BASELINE.json
    config #4's extension workload, scaled to this chip's HBM)."""
    from plonkathon_tpu.prover import Prover
    from plonkathon_tpu.models.examples import (
        turbo_lookup_program, turbo_lookup_witness,
    )
    from plonkathon_tpu.utils.profiling import Timings

    rep.note(f"turbo+lookup proof n={pn}: building circuit")
    program = turbo_lookup_program(pn - 8, pn)
    prover = Prover(setup, program)
    witness = turbo_lookup_witness(program)
    rep.note(f"turbo+lookup proof n={pn}: compile+warm prove")
    prover.prove(dict(witness))
    prover.timings = Timings()
    t0 = time.perf_counter()
    prover.prove(dict(witness))
    dt = time.perf_counter() - t0
    rep.update(**{
        f"proof_turbo_lookup_n{pn}_s": round(dt, 3),
        f"proof_turbo_lookup_n{pn}_rounds_ms": {
            k: round(v * 1e3, 1) for k, v in prover.timings.sections.items()
        },
    })


def section_scaling(rep: Report):
    # NB: no persistent cache in the CPU subprocess — XLA:CPU AOT cache
    # entries crash on write AND load in this environment (see conftest).
    code = (
        "import jax;"
        "jax.config.update('jax_platforms','cpu');"
        "import time,numpy as np,jax.numpy as jnp;"
        "import sys;sys.path.insert(0, %r);"
        "from plonkathon_tpu.parallel.mesh import make_mesh,NamedSharding,P;"
        "from plonkathon_tpu.parallel.sharded import sharded_ntt;"
        "from plonkathon_tpu.ops.limbs import fr;"
        "rng=np.random.default_rng(0);n1=n2=512;"
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
    ) % (HERE,)
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=max(60, min(_left() - 30, 900)),
        env=env,
    )
    for line in out.stdout.splitlines():
        if line.startswith("SCALING"):
            _, t1, t2, t8 = line.split()
            # The virtual mesh SHARES one host's cores across its 8
            # "devices": total work is fixed, so wall-clock strong scaling
            # is structurally ~1x there.  It validates the sharded NTT's
            # correctness + collective overhead, not chip scaling.  Real
            # multi-chip efficiency is projected from the measured
            # single-chip NTT time and the four-step's ICI traffic
            # (one all_to_all: each device exchanges (D-1)/D of its
            # 16-limb shard; v5e ICI ~45 GB/s/link was used).
            ntt_ms = rep.extras.get("ntt_2e18_ms")
            proj = {}
            if ntt_ms:
                total_bytes = 16 * (1 << 18) * 4  # limb-major u32 array
                for d in (2, 8):
                    compute = (ntt_ms / 1e3) * 1.3 / d  # 4-step ~1.3x flops
                    comm = (total_bytes / d) * (d - 1) / d / 45e9
                    base = (ntt_ms / 1e3) * 1.3
                    proj[f"ntt_scaling_eff_{d}dev_projected"] = round(
                        base / (d * (compute + comm)), 3
                    )
            rep.update(
                ntt_scaling_n=512 * 512,
                ntt_scaling_virtual_t1_s=round(float(t1), 2),
                ntt_scaling_virtual_t2_s=round(float(t2), 2),
                ntt_scaling_virtual_t8_s=round(float(t8), 2),
                ntt_scaling_virtual_note=(
                    "virtual devices share one host's cores; wall-clock "
                    "strong scaling is not measurable on this rig"
                ),
                **proj,
            )
            return
    raise RuntimeError(
        f"no SCALING line; rc={out.returncode} stderr={out.stderr[-300:]}"
    )


def main():
    from plonkathon_tpu.kzg import Setup

    rep = Report()
    rng = np.random.default_rng(42)
    platform = jax.default_backend()

    # ---- 1. MSM throughput ---------------------------------------------
    setup_big = None
    try:
        if platform == "tpu":
            # Headline at 2^18: Pippenger rates improve with n and this SRS
            # is shared with the 2^18 proof section.
            msm_n = 1 << 18
            rep.note(f"generating synthetic SRS at 2^{msm_n.bit_length()-1}")
            setup_big = Setup.generate(
                msm_n, srs_cache=os.path.join(HERE, ".srs_cache")
            )
        else:
            msm_n = 1 << 11
            setup_big = Setup.from_file(PTAU)
        section_msm(rep, rng, setup_big, msm_n)
    except Exception as exc:  # noqa: BLE001 — report partial results
        rep.update(msm_error=repr(exc)[:300])

    # ---- 2. Pallas self-check (TPU only) -------------------------------
    if platform == "tpu":
        try:
            section_selfcheck(rep, rng)
        except Exception as exc:  # noqa: BLE001
            rep.update(pallas_selfcheck=f"FAIL: {repr(exc)[:300]}")

    # ---- 3. NTT throughput ---------------------------------------------
    try:
        if _left() > 120:
            section_ntt(rep, rng)
    except Exception as exc:  # noqa: BLE001
        rep.update(ntt_error=repr(exc)[:300])

    # ---- 4. Proof latency n=2^10 (ceremony SRS) ------------------------
    try:
        if _left() > 240:
            setup = Setup.from_file(PTAU)
            section_proof(rep, setup, 1 << 10, "n1024")
    except Exception as exc:  # noqa: BLE001
        rep.update(proof_error=repr(exc)[:300])

    # ---- 5. Full proof at n=2^18 (TPU, synthetic SRS) ------------------
    try:
        if platform == "tpu" and _left() > 420:
            pn = 1 << 18
            if setup_big is not None and len(setup_big.powers_of_x) == pn:
                setup18 = setup_big  # shared with the MSM section
            else:
                rep.note(f"generating synthetic SRS at 2^{pn.bit_length()-1}")
                setup18 = Setup.generate(
                    pn, srs_cache=os.path.join(HERE, ".srs_cache")
                )
            section_proof(rep, setup18, pn, "n262144")
    except Exception as exc:  # noqa: BLE001
        rep.update(proof18_error=repr(exc)[:300])

    # ---- 5b. TurboPlonK + PlonKup extension proof ----------------------
    try:
        if platform == "tpu" and _left() > 400 and setup_big is not None:
            section_turbo(rep, setup_big, 1 << 18)
    except Exception as exc:  # noqa: BLE001
        rep.update(turbo_error=repr(exc)[:300])

    # ---- 6. Virtual-mesh NTT scaling (CPU subprocess) ------------------
    try:
        if _left() > 120:
            section_scaling(rep)
    except Exception as exc:  # noqa: BLE001
        rep.update(scaling_error=repr(exc)[:300])

    rep.emit()


if __name__ == "__main__":
    main()
