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
