#!/usr/bin/env python
"""Sweep the fused-engine tile knobs on the device.

Times a full blind rotate on either lattice ("aux" extraction preset or
the "main" message lattice) across (rotate_decompose block, fused block,
combos-per-cell) combinations and the precomputed-strip-table variant, so
`pbs.FUSED_KNOBS` and the strip-precompute default are measured, not
guessed.  Each config mutates the module knobs and clears the jit caches
(the knobs are read at trace time).

Usage:
  python tools/tune_fused.py aux  [M]     # default M=4096
  python tools/tune_fused.py main [M]     # default M=2048
Env: TUNE_CONFIGS="rd:fe:gc[:pre],..." to override the sweep list.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "aux"
    import jax
    import jax.numpy as jnp
    from dct_cryptonets_tpu.fhe import pbs, torus as T
    from dct_cryptonets_tpu.fhe.keys import (encrypt_lwe, keygen,
                                             make_aux_server_keys,
                                             make_server_keys)
    from dct_cryptonets_tpu.fhe.params import (default_exact_rounding,
                                               params_for_precision)

    main_params = params_for_precision(6)
    cfg = default_exact_rounding(main_params)
    ck = keygen(main_params, seed=0)
    os.makedirs(".cache", exist_ok=True)

    if which == "aux":
        p = cfg.aux
        M = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
        drop, cross = 3, 0
        cache = (f".cache/bench_aux_v2_n{p.lwe_dim}_k{p.glwe_dim}"
                 f"_N{p.poly_size}_main{main_params.poly_size}.npz")
        if os.path.exists(cache):
            z = np.load(cache)
            bsk = z["bsk"]
        else:
            ak = make_aux_server_keys(ck, p, seed=2,
                                      back_base_log=cfg.back_base_log,
                                      back_levels=cfg.back_levels)
            bsk = ak.bsk
        key = ck.big_lwe_key if p.big_lwe_dim == main_params.big_lwe_dim \
            else None
        knob_key = "small"
    else:
        p = main_params
        M = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
        drop, cross = 2, 1
        cache = (f".cache/bench_keys_v2_n{p.lwe_dim}_N{p.poly_size}"
                 f"_k{p.glwe_dim}_b{p.pbs_base_log}_l{p.pbs_levels}"
                 f"_kb{p.ks_base_log}_kl{p.ks_levels}.npz")
        if os.path.exists(cache):
            bsk = np.load(cache)["bsk"]
        else:
            bsk = make_server_keys(ck, seed=1).bsk
        knob_key = "main"

    with np.errstate(over="ignore"):
        doubled = np.concatenate([bsk, -bsk], axis=-1)
    bsk_bytes = jnp.asarray(pbs.u64_to_balanced_bytes(doubled))

    # per-sample test polys + mod-switched mask/body
    rng = np.random.default_rng(5)
    N = p.poly_size
    test = T.from_u64(rng.integers(0, 1 << 63, (M, N)).astype(np.uint64))
    ct_a = jnp.asarray(rng.integers(0, 2 * N, (M, p.lwe_dim)), jnp.uint32)
    ct_b = jnp.asarray(rng.integers(0, 2 * N, (M,)), jnp.uint32)

    env = os.environ.get("TUNE_CONFIGS")
    if env:
        configs = []
        for part in env.split(","):
            f = part.split(":")
            configs.append((int(f[0]), int(f[1]), int(f[2]),
                            len(f) > 3 and f[3] == "pre"))
    elif which == "aux":
        configs = [(128, 1024, 2, False), (128, 1024, 2, True),
                   (128, 1024, 3, True), (128, 1024, 6, True),
                   (256, 1024, 2, True), (128, 512, 2, True),
                   (64, 1024, 2, True), (128, 1024, 1, True)]
    else:
        configs = [(64, 256, 1, False), (64, 256, 2, False),
                   (128, 256, 1, False), (64, 512, 1, False),
                   (32, 256, 1, False)]

    @jax.jit
    def br(test, ct_a, ct_b, bigd_all):
        return pbs.blind_rotate(test, ct_a, ct_b, bsk_bytes, p,
                                drop_limbs=drop, cross=cross,
                                engine="fused", bigd_all=bigd_all)

    for rd, fe, gc, pre in configs:
        pbs.FUSED_KNOBS[knob_key] = (rd, fe, gc)
        jax.clear_caches()
        bigd_all = None
        if pre:
            t0 = time.time()
            bigd_all = pbs.precompute_bigd_strips(
                bsk_bytes, p.glwe_dim, p.pbs_levels, N, drop)
            bigd_all.block_until_ready()
            pre_s = time.time() - t0
        try:
            t0 = time.time()
            out = br(test, ct_a, ct_b, bigd_all)
            _ = int(np.asarray(out.hi[0, 0, 0]))
            compile_s = time.time() - t0
            iters = 3
            t0 = time.time()
            cur = test
            for _ in range(iters):
                out = br(cur, ct_a, ct_b, bigd_all)
                cur = T.T64(out.hi[:, 0], out.lo[:, 0])  # chain: vary input
            _ = int(np.asarray(cur.hi[0, 0]))
            dt = (time.time() - t0) / iters
            msg = (f"rd={rd} fe={fe} gc={gc} pre={int(pre)}: "
                   f"{dt:.3f}s per {M}-rotate batch -> {M/dt:.1f}/s "
                   f"(compile {compile_s:.1f}s"
                   + (f", strip build {pre_s:.1f}s" if pre else "") + ")")
        except Exception as e:  # noqa: BLE001 — report infeasible configs
            msg = f"rd={rd} fe={fe} gc={gc} pre={int(pre)}: FAILED {e}"
        print(msg, flush=True)


if __name__ == "__main__":
    main()
