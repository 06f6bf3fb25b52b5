"""Pallas TPU kernels for the blind-rotate hot path.

The CMUX step splits into (a) an elementwise stage — per-sample negacyclic
rotation, subtraction, gadget decomposition, byte splitting — and (b) an
MXU stage (the int8 convolution external product, fhe/pbs.py).  Stage (b)
already runs at MXU speed through XLA; stage (a) in XLA costs dozens of
HBM round-trips over the accumulator per step.  This kernel fuses stage (a)
into ONE pass: the accumulator tile stays in VMEM through all
rotate/diff/decompose/byte-split arithmetic and only the small int8 digit
bytes go back to HBM.

Rotation uses the same bit-decomposition trick as the XLA path
(log2(2N) conditional static rolls), but rolls in VMEM via
jnp.concatenate on registers instead of HBM-bounced selects.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U32 = jnp.uint32
I32 = jnp.int32


def _neg64(hi, lo):
    nlo = (~lo) + U32(1)
    carry = (nlo == 0).astype(U32)
    return (~hi) + carry, nlo


def _sub64(ahi, alo, bhi, blo):
    borrow = (alo < blo).astype(U32)
    return ahi - bhi - borrow, alo - blo


def _rotate_diff_kernel(amt_ref, hi_ref, lo_ref, dhi_ref, dlo_ref, *,
                        n_poly: int, block_m: int):
    """diff = X^amt * acc - acc for one (k+1, N) accumulator row batch.

    Block: hi/lo (TM, J, N) uint32; amt (TM, 1) int32 in VMEM.

    Strategy: build the doubled-negated buffer [p, -p] (length 2N) once;
    X^a is then a *pure circular roll* by a on it (the negacyclic sign is
    baked into the second half), implemented as log2(2N) per-sample
    conditional pltpu.roll's — all VMEM-resident.
    """
    N = n_poly
    bits = int(np.log2(2 * N))
    hi = hi_ref[:]
    lo = lo_ref[:]
    amt = amt_ref[:, 0]                               # (TM,) int32
    nhi, nlo = _neg64(hi, lo)
    dhi = jnp.concatenate([hi, nhi], axis=-1)         # (TM, J, 2N)
    dlo = jnp.concatenate([lo, nlo], axis=-1)
    for b in range(bits):
        r = 1 << b
        rhi = pltpu.roll(dhi, r, axis=dhi.ndim - 1)
        rlo = pltpu.roll(dlo, r, axis=dlo.ndim - 1)
        cond = ((amt >> b) & 1).astype(jnp.bool_)
        cond = cond.reshape((-1,) + (1,) * (dhi.ndim - 1))
        dhi = jnp.where(cond, rhi, dhi)
        dlo = jnp.where(cond, rlo, dlo)
    ohi = dhi[..., :N]
    olo = dlo[..., :N]
    shi, slo = _sub64(ohi, olo, hi, lo)
    dhi_ref[:] = shi
    dlo_ref[:] = slo


def _rotate_decompose_kernel(amt_ref, hi_ref, lo_ref, out0_ref, out1_ref, *,
                             n_poly: int, blog: int, levels: int,
                             dbytes: int):
    """Fused CMUX front half for one accumulator tile:
    rotate -> diff -> gadget-decompose -> byte-split.

    Blocks: hi/lo (TM, J, N) uint32; amt (TM, 1) int32;
    outputs per digit byte u: (TM, J*levels*N) int8 laid out so that a
    reshape to (TM, J*levels, N) gives row r = j*levels + lev — the conv's
    channel-major input.  Everything between the acc load and the int8
    store stays in VMEM: one pass instead of ~30 XLA kernels.
    """
    N = n_poly
    bits = int(np.log2(2 * N))
    hi = hi_ref[:]
    lo = lo_ref[:]
    J = hi.shape[1]
    amt = amt_ref[:, 0]

    # rotation on the doubled-negated buffer: pure circular roll
    nhi, nlo = _neg64(hi, lo)
    dhi = jnp.concatenate([hi, nhi], axis=-1)
    dlo = jnp.concatenate([lo, nlo], axis=-1)
    for b in range(bits):
        rhi = pltpu.roll(dhi, 1 << b, axis=dhi.ndim - 1)
        rlo = pltpu.roll(dlo, 1 << b, axis=dlo.ndim - 1)
        cond = ((amt >> b) & 1).astype(jnp.bool_)
        cond = cond.reshape((-1,) + (1,) * (dhi.ndim - 1))
        dhi = jnp.where(cond, rhi, dhi)
        dlo = jnp.where(cond, rlo, dlo)
    shi, slo = _sub64(dhi[..., :N], dlo[..., :N], hi, lo)

    # gadget decomposition of the diff (mirrors torus.decompose)
    total = blog * levels
    k_sh = 64 - total
    # round_shift_right: top `total` bits with round-half-up
    halfhi = U32(1) << U32(k_sh - 1 - 32) if k_sh - 1 >= 32 else U32(0)
    halflo = U32(1) << U32(k_sh - 1) if k_sh - 1 < 32 else U32(0)
    rlo2 = slo + halflo
    carry = (rlo2 < slo).astype(U32)
    rhi2 = shi + halfhi + carry
    if k_sh == 32:
        top = rhi2
    elif k_sh > 32:
        top = rhi2 >> U32(k_sh - 32)
    else:
        top = (rhi2 << U32(32 - k_sh)) | (rlo2 >> U32(k_sh))

    mask = U32((1 << blog) - 1)
    half = U32(1 << (blog - 1))
    digits = []
    carry_d = jnp.zeros_like(top)
    for i in range(levels):
        chunk = (top >> U32(i * blog)) & mask
        d = chunk + carry_d
        carry_d = ((d + half) >> U32(blog)).astype(U32)
        d_signed = d.astype(I32) - (carry_d << U32(blog)).astype(I32)
        digits.append(d_signed)
    digits.reverse()   # most-significant first: digits[lev]

    # byte-split each digit and store rows r = j*levels + lev
    outs = [out0_ref, out1_ref][:dbytes]
    for u in range(dbytes):
        for j in range(J):
            for lev in range(levels):
                d = digits[lev][:, j, :]
                r = d
                for _ in range(u):
                    b8 = ((r + 128) & 255) - 128
                    r = (r - b8) >> 8
                b8 = (((r + 128) & 255) - 128).astype(jnp.int8)
                row = j * levels + lev
                outs[u][:, row * N:(row + 1) * N] = b8


@functools.partial(jax.jit, static_argnames=("blog", "levels", "dbytes",
                                             "block_m", "interpret"))
def rotate_decompose(acc_hi, acc_lo, amounts, blog: int, levels: int,
                     dbytes: int, block_m: int = 16,
                     interpret: bool | None = None):
    """Fused rotate+diff+decompose+byte-split.

    acc: (M, J, N) uint32 pair; amounts (M,).
    Returns dB int8 of shape (dbytes, M, J*levels, N).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    M, J, N = acc_hi.shape
    rows = J * levels
    grid = (pl.cdiv(M, block_m),)
    kernel = functools.partial(_rotate_decompose_kernel, n_poly=N, blog=blog,
                               levels=levels, dbytes=dbytes)
    n_out = dbytes
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, J, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, J, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_m, rows * N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        ] * n_out,
        out_shape=[jax.ShapeDtypeStruct((M, rows * N), jnp.int8)] * n_out,
        interpret=interpret,
    )(amounts.astype(I32).reshape(-1, 1), acc_hi, acc_lo)
    outs = outs if isinstance(outs, (list, tuple)) else [outs]
    return jnp.stack([o.reshape(M, rows, N) for o in outs], axis=0)


def _add64(ahi, alo, bhi, blo):
    lo = alo + blo
    carry = (lo < alo).astype(U32)
    return ahi + bhi + carry, lo


def _shift64_from_i32(v, k):
    """(int32 v) * 2^k mod 2^64 as (hi, lo) uint32, static k in [0, 64)."""
    lo = v.astype(U32)
    hi = (v >> 31).astype(U32)
    if k == 0:
        return hi, lo
    if k >= 32:
        return (lo << U32(k - 32)) if k > 32 else lo, jnp.zeros_like(lo)
    return (hi << U32(k)) | (lo >> U32(32 - k)), lo << U32(k)


def _combine_kernel(o0_ref, o1_ref, hi_ref, lo_ref, ohi_ref, olo_ref, *,
                    n_poly: int, glwe_dims: int, limbs: int, drop: int,
                    dbytes: int):
    """acc += external-product result, from the raw conv-output buckets.

    o_u: (TM, (k+1)*limbs, N) int32 — conv outputs per digit byte u;
    channel c = j * limbs + vi corresponds to key byte v = vi + drop.
    One VMEM pass replaces the ~15 XLA kernels of bucket shifts + T64 adds.
    """
    N = n_poly
    J = glwe_dims
    os_ = [o0_ref, o1_ref][:dbytes]
    hi = hi_ref[:]
    lo = lo_ref[:]
    out_hi = []
    out_lo = []
    for j in range(J):
        ahi = hi[:, j, :]
        alo = lo[:, j, :]
        # sum int32 buckets sharing the same byte scale s, then widen once
        buckets: dict[int, object] = {}
        for u in range(dbytes):
            o = os_[u]
            for vi in range(limbs):
                s = u + vi + drop
                if s >= 8:
                    continue
                term = o[:, j * limbs + vi, :]
                buckets[s] = term if s not in buckets else buckets[s] + term
        for s, b in buckets.items():
            bhi, blo = _shift64_from_i32(b, 8 * s)
            ahi, alo = _add64(ahi, alo, bhi, blo)
        out_hi.append(ahi)
        out_lo.append(alo)
    ohi_ref[:] = jnp.stack(out_hi, axis=1)
    olo_ref[:] = jnp.stack(out_lo, axis=1)


@functools.partial(jax.jit, static_argnames=("drop", "block_m", "interpret"))
def combine_accumulate(o0, o1, acc_hi, acc_lo, drop: int,
                       block_m: int = 16, interpret: bool | None = None):
    """acc + recombined external product from conv-output byte buckets.

    o0/o1: (M, (k+1)*limbs, N) int32; acc: (M, J, N) uint32 pair.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    M, J, N = acc_hi.shape
    limbs = o0.shape[1] // J
    kernel = functools.partial(_combine_kernel, n_poly=N, glwe_dims=J,
                               limbs=limbs, drop=drop, dbytes=2)
    grid = (pl.cdiv(M, block_m),)
    spec_o = pl.BlockSpec((block_m, J * limbs, N), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_a = pl.BlockSpec((block_m, J, N), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    ohi, olo = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec_o, spec_o, spec_a, spec_a],
        out_specs=[spec_a, spec_a],
        out_shape=[jax.ShapeDtypeStruct((M, J, N), U32)] * 2,
        interpret=interpret,
    )(o0, o1, acc_hi, acc_lo)
    return ohi, olo


@functools.partial(jax.jit, static_argnames=("block_m", "interpret"))
def rotate_diff(acc_hi, acc_lo, amounts, block_m: int = 8,
                interpret: bool | None = None):
    """Batched (X^a * acc - acc): acc (M, J, N) uint32 pair, amounts (M,).

    Returns (dhi, dlo) with the same shape.  One fused VMEM pass.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    M, J, N = acc_hi.shape
    grid = (pl.cdiv(M, block_m),)
    kernel = functools.partial(_rotate_diff_kernel, n_poly=N,
                               block_m=block_m)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, J, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, J, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_m, J, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, J, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, J, N), U32),
            jax.ShapeDtypeStruct((M, J, N), U32),
        ],
        interpret=interpret,
    )(amounts.astype(I32).reshape(-1, 1), acc_hi, acc_lo)
