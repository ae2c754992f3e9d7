"""Fine-grained wall-clock profile of one warm proof at n=2^18 on the TPU.

Attributes time to: host witness/limb conversion, each fused round jit
(forced sync), digit generation, the msm3 pipeline, and host affine
fetches.  Run:  python scripts/profile_prove.py [log2n]
"""

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache")
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import jax.numpy as jnp

from plonkathon_tpu.kzg import Setup
from plonkathon_tpu.models.examples import mul_chain_program
from plonkathon_tpu import prover as prover_mod
from plonkathon_tpu.prover import Prover
from plonkathon_tpu.ops import limbs
from plonkathon_tpu.ops import curve

ACC = {}


def acc(key, dt):
    ACC[key] = ACC.get(key, 0.0) + dt


def timed(key, fn):
    def wrap(*a, **k):
        t0 = time.perf_counter()
        out = fn(*a, **k)
        acc(key, time.perf_counter() - t0)
        return out

    return wrap


def sync_leaf(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    for x in leaves:
        if hasattr(x, "block_until_ready"):
            x.block_until_ready()
    if leaves:
        np.asarray(jax.tree_util.tree_leaves(tree)[0]).ravel()[:1]
    return tree


def main():
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    n = 1 << log2n

    t0 = time.perf_counter()
    setup = Setup.generate(n, srs_cache=os.path.join(HERE, ".srs_cache"))
    print(f"srs: {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    program = mul_chain_program(n - 8, n)
    print(f"circuit build: {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    prover = Prover(setup, program)
    print(f"prover init (preprocess): {time.perf_counter()-t0:.1f}s", flush=True)

    from plonkathon_tpu.models.examples import mul_chain_witness

    witness = mul_chain_witness(program)

    # Instrument: host limb conversions.
    fr = limbs.fr
    fr.to_mont_host_many = timed("host:to_mont", fr.to_mont_host_many)
    fr.from_mont_host_many = timed("host:from_mont", fr.from_mont_host_many)

    # Instrument: round jits (force device sync so time lands on the jit).
    real_jits = dict(prover._jits)

    def wrap_jit(name, f):
        def w(*a, **k):
            t0 = time.perf_counter()
            out = f(*a, **k)
            sync_leaf(out)
            acc(f"jit:{name}", time.perf_counter() - t0)
            return out

        return w

    for kname in list(real_jits):
        prover._jits[kname] = wrap_jit(kname, real_jits[kname])

    # Instrument: MSM engine internals.
    eng = setup.msm_engine
    orig_deferred = eng.msm_mont_deferred

    def deferred(c):
        t0 = time.perf_counter()
        out = orig_deferred(c)
        sync_leaf(out[0])
        acc("msm:pipeline", time.perf_counter() - t0)
        return out

    eng.msm_mont_deferred = deferred
    orig_batch = eng.commit_batch

    def batch(cl):
        t0 = time.perf_counter()
        out = orig_batch(cl)
        acc("msm:commit_batch_total", time.perf_counter() - t0)
        return out

    eng.commit_batch = batch
    prover_mod.jac_to_affine_host = timed(
        "host:jac_to_affine", prover_mod.jac_to_affine_host
    )
    curve.jac_to_affine_host = timed(
        "host:jac_to_affine", curve.jac_to_affine_host
    )

    from plonkathon_tpu.utils.profiling import Timings

    for rep in range(2):
        ACC.clear()
        prover.timings = Timings()
        t0 = time.perf_counter()
        proof = prover.prove(dict(witness))
        total = time.perf_counter() - t0
        tag = "cold" if rep == 0 else "warm"
        print(f"\n== prove {tag}: {total:.2f}s ==", flush=True)
        for k, v in sorted(ACC.items(), key=lambda kv: -kv[1]):
            print(f"  {k:28s} {v*1e3:9.1f} ms")
        rounds = {
            k: v["seconds"] for k, v in prover.timings.summary().items()
        }
        print(f"  rounds: {rounds}", flush=True)
    assert proof is not None


if __name__ == "__main__":
    main()
