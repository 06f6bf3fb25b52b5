#!/usr/bin/env python
"""Benchmark: batched TFHE PBS throughput on the flagship encrypted-inference
circuit (CIFAR-10 ResNet-20, DCT 24x16^2, rounding 6 bits).

Prints ONE JSON line:
  {"metric": "pbs_per_sec", "value": <PBS/s on this chip>, "unit": "PBS/s",
   "vs_baseline": <ratio vs the reference's 565 s/image on a 96-core CPU,
                   i.e. (our est. images/s) / (reference images/s) for the
                   same circuit>}

Reference baseline: 565 s per encrypted CIFAR-10 ResNet-20 DCT image
(reference README.md:84); the circuit's PBS count comes from our own
lowering of the same topology, so vs_baseline compares image throughput.

Environment knobs:
  BENCH_M           PBS batch size        (default 2048 on TPU, 64 on CPU)
  BENCH_STEPS       blind-rotate steps to time (default: full n)
  BENCH_DROP_LIMBS  low BSK byte limbs to skip (default 3; noise-safe per
                    the NoiseModel with the base-2^13 gadget)
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF_LATENCY_S = 565.0  # reference README.md:84


def circuit_pbs_totals(circ):
    """(main TLU sites, aux extraction bootstraps) per image.

    The reference's Concrete compile defaults to EXACT rounding semantics
    (rounding_threshold_bits as an int; homomorphic_eval.py:276-285), whose
    per-TLU cost includes one small-set bootstrap per dropped accumulator
    bit — so the honest image-latency estimate must count both."""
    from dct_cryptonets_tpu.fhe.circuit import Tlu
    shapes = circ.meta["shapes"]
    main = aux = 0
    for op in circ.ops:
        if isinstance(op, Tlu):
            sites = int(np.prod(shapes[op.x]))
            main += sites
            aux += sites * op.spec.shift
    return main, aux


def build_circuit():
    import jax
    import jax.numpy as jnp
    from dct_cryptonets_tpu.data import CodecConfig, dct_ingest
    from dct_cryptonets_tpu.data.pipeline import load_synthetic
    from dct_cryptonets_tpu.models import (build_spec, calibrate_scales,
                                           forward, init_model)
    from dct_cryptonets_tpu.fhe.compiler import lower

    cfg = CodecConfig(channels=24, filter_size=4, image_size_dct=16)
    spec = build_spec("ResNet20qat", in_channels=24, img_size=16,
                      num_classes=10, bit_width=4)
    params, state = init_model(jax.random.key(0), spec)
    ds = load_synthetic(64, 64, 10, seed=0)
    x = dct_ingest(jnp.asarray(ds.images), cfg)
    params = calibrate_scales(params, state, x, spec)
    _, _, state = forward(params, state, x, spec, train=True)
    # calibration-based accumulator budgets, like the reference compile
    # (it always passes a calibration batch; homomorphic_eval.py:259-285) —
    # smaller budgets mean fewer exact-rounding extraction bits
    circ = lower(params, state, spec, rounding_threshold_bits=6,
                 calib_data=x)
    return circ


def get_keys(params, cache_dir=".cache"):
    """Keygen with on-disk cache (host-side keygen is minutes of numpy)."""
    from dct_cryptonets_tpu.fhe.keys import keygen, make_server_keys
    from dct_cryptonets_tpu.fhe.pbs import preprocess_server_keys

    os.makedirs(cache_dir, exist_ok=True)
    tag = (f"n{params.lwe_dim}_N{params.poly_size}_k{params.glwe_dim}"
           f"_b{params.pbs_base_log}_l{params.pbs_levels}"
           f"_kb{params.ks_base_log}_kl{params.ks_levels}")
    path = os.path.join(cache_dir, f"bench_keys_{tag}.npz")
    ck = keygen(params, seed=0)
    if os.path.exists(path):
        z = np.load(path)
        from dct_cryptonets_tpu.fhe.keys import ServerKeyMaterial
        sk = ServerKeyMaterial(params, z["bsk"], z["ksk"])
    else:
        t = time.time()
        sk = make_server_keys(ck, seed=1)
        print(f"# keygen {time.time()-t:.1f}s", file=sys.stderr)
        np.savez_compressed(path, bsk=sk.bsk, ksk=sk.ksk)
    return ck, preprocess_server_keys(sk)


def main():
    import jax
    import jax.numpy as jnp
    from dct_cryptonets_tpu.fhe import torus as T
    from dct_cryptonets_tpu.fhe.circuit import Tlu
    from dct_cryptonets_tpu.fhe.keys import encrypt_lwe
    from dct_cryptonets_tpu.fhe.params import params_for_precision
    from dct_cryptonets_tpu.fhe.pbs import bootstrap

    on_tpu = jax.devices()[0].platform != "cpu"
    # M=2048 is the measured sweet spot on this chip (the old M>=2048
    # worker faults disappeared with the fused Pallas engine).
    M = int(os.environ.get("BENCH_M", 2048 if on_tpu else 64))
    # default drop matches the circuit noise audit's choice for the
    # flagship (most layers 3, aux 3 — see fhe/noise_audit.py)
    drop = int(os.environ.get("BENCH_DROP_LIMBS", 3))

    circ = build_circuit()
    num_pbs, num_aux = circuit_pbs_totals(circ)
    max_r = max(op.spec.in_bits for op in circ.ops if isinstance(op, Tlu))
    params = params_for_precision(max_r)
    print(f"# circuit: {num_pbs} PBS/image + {num_aux} exact-rounding "
          f"extractions, max TLU bits {max_r}, "
          f"max acc bits {circ.max_bit_width()}", file=sys.stderr)
    print(f"# params: n={params.lwe_dim} N={params.poly_size} "
          f"l={params.pbs_levels} B=2^{params.pbs_base_log}; M={M} "
          f"drop_limbs={drop}", file=sys.stderr)

    ck, dsk = get_keys(params)

    rng = np.random.default_rng(7)
    bits = max_r
    msgs = rng.integers(0, 2 ** bits, M)
    mu = msgs.astype(np.uint64) << np.uint64(64 - bits - 1)
    ct = encrypt_lwe(ck, mu, rng, key=ck.big_lwe_key,
                     noise_log2=params.glwe_noise_log2)
    ct = T.from_u64(ct)
    tables = jnp.asarray(
        rng.integers(-7, 8, (M, 2 ** bits)).astype(np.int32))

    # The output of a PBS is a big-LWE ciphertext of the same shape as the
    # input, so iterations CHAIN (out -> next in): inputs differ every
    # iteration, which defeats the axon platform's replay cache for
    # identical (executable, inputs), and the final scalar fetch forces
    # the whole chain to really execute (block_until_ready alone does not
    # wait for real work here — see PERFORMANCE.md measurement rules).
    def run(c, t):
        return bootstrap(c, t, dsk, params, out_delta_log2=params.delta_log2,
                         drop_limbs=drop)

    # warmup/compile
    t0 = time.time()
    out = run(ct, tables)
    _ = int(np.asarray(out.hi[0, 0]))
    print(f"# compile+first run {time.time()-t0:.1f}s", file=sys.stderr)

    iters = 3 if on_tpu else 1
    t0 = time.time()
    cur = ct
    for _ in range(iters):
        cur = run(cur, tables)
    _ = int(np.asarray(cur.hi[0, 0]))
    dt = (time.time() - t0) / iters
    rate = M / dt

    # honest image-latency estimate, reference-default (EXACT) rounding:
    # aux extraction bootstraps run the same engine on the small aux set;
    # their blind-rotate work is aux_unit main-PBS units each (the n*N^2
    # work model tracks the measured ratio within ~25%; tools/bench_aux.py
    # measures it directly).
    from dct_cryptonets_tpu.fhe.params import default_exact_rounding
    aux_p = default_exact_rounding(params).aux
    aux_unit = (aux_p.lwe_dim * aux_p.poly_size ** 2) / (
        params.lwe_dim * params.poly_size ** 2)
    mode = os.environ.get("BENCH_MODE", "exact")
    eq_pbs = num_pbs + (num_aux * aux_unit if mode == "exact" else 0.0)
    est_latency = eq_pbs / rate
    vs = REF_LATENCY_S / est_latency
    print(f"# {dt:.2f}s per {M}-PBS batch -> {rate:.1f} PBS/s; "
          f"{mode}-rounding image cost {eq_pbs:.0f} main-PBS-equiv -> "
          f"est. latency {est_latency:.1f}s (ref {REF_LATENCY_S}s exact)",
          file=sys.stderr)
    print(json.dumps({"metric": "pbs_per_sec", "value": round(rate, 2),
                      "unit": "PBS/s", "vs_baseline": round(vs, 3)}))


if __name__ == "__main__":
    main()
