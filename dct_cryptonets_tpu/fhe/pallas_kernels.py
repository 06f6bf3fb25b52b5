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
                             dbytes: int, plane_major: bool = False):
    """Fused CMUX front half for one accumulator tile:
    rotate -> diff -> gadget-decompose -> byte-split.

    Blocks: hi/lo (TM, J, N) uint32; amt (TM, 1) int32;
    outputs per digit byte u: (TM, J*levels, N) int8 with row r =
    j*levels + lev — the channel-major layout both the conv engine and the
    fused matmul engine consume.  Everything between the acc load and the
    int8 store stays in VMEM: one pass instead of ~30 XLA kernels.
    """
    N = n_poly
    bits = int(np.log2(N))
    hi = hi_ref[:]
    lo = lo_ref[:]
    J = hi.shape[0] if plane_major else hi.shape[1]
    amt = amt_ref[:, 0]

    # Width-N rotation: X^a = (-1)^g X^r with a = g*N + r.  Roll by r via
    # log2(N) per-sample-masked static rolls, then one sign-flip select on
    # positions x < r XOR g — half the VPU traffic of rolling the doubled
    # [p, -p] buffer.
    cond_shape = (1, -1, 1) if plane_major else (-1, 1, 1)
    r_amt = amt & (N - 1)
    g_bit = (amt >> bits) & 1
    dhi, dlo = hi, lo
    for b in range(bits):
        rhi = pltpu.roll(dhi, 1 << b, axis=dhi.ndim - 1)
        rlo = pltpu.roll(dlo, 1 << b, axis=dlo.ndim - 1)
        cond = ((r_amt >> b) & 1).astype(jnp.bool_).reshape(cond_shape)
        dhi = jnp.where(cond, rhi, dhi)
        dlo = jnp.where(cond, rlo, dlo)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, N), 2)
    flip = (col < r_amt.reshape(cond_shape)) ^ (
        g_bit.reshape(cond_shape) == 1)
    fhi, flo = _neg64(dhi, dlo)
    dhi = jnp.where(flip, fhi, dhi)
    dlo = jnp.where(flip, flo, dlo)
    shi, slo = _sub64(dhi, dlo, hi, lo)

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
                d = (digits[lev][j] if plane_major
                     else digits[lev][:, j, :])
                r = d
                for _ in range(u):
                    b8 = ((r + 128) & 255) - 128
                    r = (r - b8) >> 8
                b8 = (((r + 128) & 255) - 128).astype(jnp.int8)
                row = j * levels + lev
                if plane_major:
                    outs[u][row] = b8
                else:
                    outs[u][:, row] = b8


@functools.partial(jax.jit, static_argnames=("blog", "levels", "dbytes",
                                             "block_m", "interpret",
                                             "plane_major"))
def rotate_decompose(acc_hi, acc_lo, amounts, blog: int, levels: int,
                     dbytes: int, block_m: int = 16,
                     interpret: bool | None = None,
                     plane_major: bool = False):
    """Fused rotate+diff+decompose+byte-split.

    Sample-major (default): acc (M, J, N) uint32 pair -> tuple of dbytes
    int8 arrays (M, J*levels, N) — the conv engine's layout.
    Plane-major (``plane_major=True``): acc (J, M, N) -> (J*levels, M, N)
    — the fused matmul engine's layout (TPU block shapes need the size-1
    block dim leading, not in the middle).  amounts: (M,).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if plane_major:
        J, M, N = acc_hi.shape
    else:
        M, J, N = acc_hi.shape
    rows = J * levels
    grid = (pl.cdiv(M, block_m),)
    kernel = functools.partial(_rotate_decompose_kernel, n_poly=N, blog=blog,
                               levels=levels, dbytes=dbytes,
                               plane_major=plane_major)
    n_out = dbytes
    if plane_major:
        spec_acc = pl.BlockSpec((J, block_m, N), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)
        spec_out = pl.BlockSpec((rows, block_m, N), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((rows, M, N), jnp.int8)
    else:
        spec_acc = pl.BlockSpec((block_m, J, N), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        spec_out = pl.BlockSpec((block_m, rows, N), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((M, rows, N), jnp.int8)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            spec_acc,
            spec_acc,
        ],
        out_specs=[spec_out] * n_out,
        out_shape=[out_shape] * n_out,
        interpret=interpret,
    )(amounts.astype(I32).reshape(-1, 1), acc_hi, acc_lo)
    return tuple(outs) if isinstance(outs, (list, tuple)) else (outs,)


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
                    dbytes: int, cross: int = 0):
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
                if s >= 8 or u + vi < cross:
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


@functools.partial(jax.jit, static_argnames=("drop", "cross", "block_m",
                                             "interpret"))
def combine_accumulate(o0, o1, acc_hi, acc_lo, drop: int, cross: int = 0,
                       block_m: int = 16, interpret: bool | None = None):
    """acc + recombined external product from conv-output byte buckets.

    o0/o1: (M, (k+1)*limbs, N) int32; acc: (M, J, N) uint32 pair.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    M, J, N = acc_hi.shape
    limbs = o0.shape[1] // J
    kernel = functools.partial(_combine_kernel, n_poly=N, glwe_dims=J,
                               limbs=limbs, drop=drop, dbytes=2, cross=cross)
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


def _shift64_from_i32_dyn(v, k):
    """(int32 v) * 2^k mod 2^64 as (hi, lo) uint32, TRACED scalar k in
    [0, 64).  Elementwise double-word shift with dynamic amount."""
    lo0 = v.astype(U32)
    hi0 = (v >> 31).astype(U32)
    klt32 = k < 32
    sh = jnp.where(klt32, k, 0).astype(U32)
    lo_lt = lo0 << sh
    spill = jnp.where(k == 0, U32(0),
                      lo0 >> (U32(32) - jnp.maximum(sh, U32(1))))
    hi_lt = (hi0 << sh) | spill
    sh_ge = jnp.where(klt32, 0, k - 32).astype(U32)
    hi_ge = lo0 << sh_ge
    return (jnp.where(klt32, hi_lt, hi_ge),
            jnp.where(klt32, lo_lt, jnp.zeros_like(lo_lt)))


def _bigd_kernel(dbl_ref, out_ref, *, n_poly: int):
    """Build a group of (128, 2N-128) Toeplitz strips from doubled
    negacyclic byte rows (length 2N each):

        strip[g, tt, x] = dbl[g, (x - tt + N + 128) mod 2N]

    via a global pre-roll + 7 row-index-masked rolls (row tt ends up rolled
    by +tt).  Mosaic rolls need 32-bit data, so FOUR byte rows are PACKED
    into the four bytes of one i32 lane, rolled together (the roll permutes
    whole i32 elements — lanes never mix), and unpacked on store: ~4x less
    VPU roll traffic than rolling each upcast row separately, which was
    ~25% of the extraction-lattice CMUX step time."""
    N = n_poly
    G = dbl_ref.shape[0]
    assert G % 4 == 0, "combo block must be a multiple of 4 (caller pads)"
    rowid = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
    for g4 in range(G // 4):
        rows = dbl_ref[4 * g4:4 * g4 + 4, :].astype(jnp.int32) & 255
        packed = (rows[0] | (rows[1] << 8) | (rows[2] << 16)
                  | (rows[3] << 24)).reshape(1, 2 * N)
        z = jnp.broadcast_to(packed, (128, 2 * N))
        z = pltpu.roll(z, N - 128, axis=1)  # z[y] = dbl[(y + N + 128) % 2N]
        for b in range(7):
            rolled = pltpu.roll(z, 1 << b, axis=1)
            z = jnp.where(((rowid >> b) & 1) == 1, rolled, z)
        z = z[:, :2 * N - 128]
        for q in range(4):
            v = (z >> (8 * q)) & 255
            out_ref[4 * g4 + q] = (v - ((v >> 7) << 8)).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def build_bigd_strips(dbl, interpret: bool | None = None):
    """dbl: (J, C, 2N) int8 doubled-negated byte rows ->
    (J, C, 128, 2N-128) int8 Toeplitz strips (same layout as
    ``pbs.build_bigd``)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    J, C, twoN = dbl.shape
    N = twoN // 2
    # combos per grid cell: the (G, 128, 2N-128) int8 out block plus the
    # packed i32 roll buffers must fit scoped VMEM (16 MB); G must stay a
    # multiple of 4 (4 byte-rows pack into one i32 lane)
    G = 8 if twoN <= 4096 else 4
    flat = dbl.reshape(J * C, twoN)
    rows = J * C
    pad = (-rows) % G
    if pad:
        flat = jnp.pad(flat, ((0, pad), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_bigd_kernel, n_poly=N),
        grid=(pl.cdiv(rows + pad, G),),
        in_specs=[pl.BlockSpec((G, twoN), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((G, 128, twoN - 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows + pad, 128, twoN - 128),
                                       jnp.int8),
        interpret=interpret,
    )(flat)
    return out[:rows].reshape(J, C, 128, twoN - 128)


def _fused_ext_kernel(dB0_ref, dB1_ref, big_ref, ahi_ref, alo_ref,
                      ohi_ref, olo_ref, bucket_ref, sems, *,
                      n_poly: int, rows: int, L: int, drop: int,
                      dbytes: int, block_m: int, cross: int = 0,
                      gc: int = 1):
    """One (m-block, j_out, combo-group) cell of the fused external product.

    combo = vi * rows + r walks the (kept key-byte, GGSW row) pairs for one
    output polynomial, key-LIMB major; a cell covers ``gc`` consecutive
    combos (gc | rows, so one cell shares a single vi/bucket).  Per combo:
    contract each digit-byte plane of row r against the combo's negacyclic
    Toeplitz as N/128 K=128 MXU matmuls whose RHS are STATIC SLICES of the
    128-row BigD strip — every (N, N) Toeplitz tile is a slice of the
    strip by construction (pbs.build_bigd), so nothing is materialized.
    Byte-scale buckets use a 2-slot sliding window: contributions of sweep
    position vi land only in buckets {vi, vi+1}, so bucket vi-1 is
    complete when vi starts and is flushed into the 64-bit accumulator
    (dynamic double-word shift).  The acc blocks live in the *output*
    refs, seeded by DMA from the HBM-resident inputs at the first cell.
    """
    N = n_poly
    c = pl.program_id(2)                 # cell = group of gc combos
    base = c * gc                        # first combo; combos are
    vi = base // rows                    # key-limb-major so one cell's
    m = pl.program_id(0)                 # group shares a single vi/bucket
    j = pl.program_id(1)
    nbuckets = 8 - drop

    @pl.when(c == 0)
    def _():
        # seed out <- acc (HBM -> VMEM block DMA), zero the bucket window
        cp_hi = pltpu.make_async_copy(
            ahi_ref.at[j, pl.ds(m * block_m, block_m)], ohi_ref.at[0],
            sems.at[0])
        cp_lo = pltpu.make_async_copy(
            alo_ref.at[j, pl.ds(m * block_m, block_m)], olo_ref.at[0],
            sems.at[1])
        cp_hi.start()
        cp_lo.start()
        cp_hi.wait()
        cp_lo.wait()
        bucket_ref[...] = jnp.zeros_like(bucket_ref)

    def flush(slot, scale_minus_drop):
        b = bucket_ref[slot]                        # dynamic slot (TM, N)
        bhi, blo = _shift64_from_i32_dyn(b, 8 * (scale_minus_drop + drop))
        hi, lo = _add64(ohi_ref[0], olo_ref[0], bhi, blo)
        ohi_ref[0] = hi
        olo_ref[0] = lo
        bucket_ref[pl.ds(slot, 1)] = jnp.zeros((1,) + b.shape, jnp.int32)

    @pl.when((base % rows == 0) & (vi > 0))
    def _():
        flush((vi - 1) % 2, vi - 1)                 # bucket vi-1 complete

    for u in range(dbytes):
        dref = (dB0_ref, dB1_ref)[u]
        si = u + vi                      # bucket index = byte scale - drop

        # scale >= 8 wraps out of q; si < cross is the audit's cross skip
        @pl.when((si < nbuckets) & (si >= cross))
        def _(dref=dref, si=si):
            # per combo g: d (TM, N) x Toeplitz (N, N) as N/128
            # native-depth matmuls against static strip slices: Toeplitz
            # rows [t0*128, ..) are strip[:, N-128*(t0+1) : 2N-128*(t0+1)]
            d = None
            for g in range(gc):
                for t0 in range(N // 128):
                    p = jax.lax.dot(
                        dref[g][:, t0 * 128:(t0 + 1) * 128],
                        big_ref[0, g, :, N - 128 * (t0 + 1):
                                2 * N - 128 * (t0 + 1)],
                        preferred_element_type=jnp.int32)
                    d = p if d is None else d + p
            slot = si % 2
            bucket_ref[pl.ds(slot, 1)] = bucket_ref[pl.ds(slot, 1)] + d[None]

    @pl.when(c == L * rows // gc - 1)
    def _():
        flush((nbuckets - 1) % 2, nbuckets - 1)     # the last bucket


@functools.partial(jax.jit, static_argnames=("drop", "cross", "block_m",
                                             "combos_per_cell", "interpret"))
def fused_external(dB0, dB1, bigd, acc_hi, acc_lo, drop: int, cross: int = 0,
                   block_m: int = 128, combos_per_cell: int | None = None,
                   interpret: bool | None = None):
    """acc + external product, fully VMEM-resident (the CMUX back half).

    dB0/dB1: (rows, M, N) int8 digit-byte planes
             (:func:`rotate_decompose` with ``plane_major=True``)
    bigd:    (k+1, L*rows, 128, 2N-128) int8 Toeplitz strips, combo index
             vi*rows + r (``pbs.build_bigd``); L = kept key-byte limbs
    acc:     (J, M, N) uint32 pair (plane-major).  Returns updated (hi, lo).

    Grid (M/TM, j_out, L*rows/gc); ``combos_per_cell`` (gc) groups
    consecutive same-vi combos into one cell (gc must divide rows) —
    fewer cells amortize grid dispatch and bucket updates.  The acc
    blocks stay resident across the combo sweep (constant index map),
    buckets accumulate in scratch, and each cell streams gc
    128x(2N-128) strips — Pallas double-buffers them.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    J, M, N = acc_hi.shape
    rows = dB0.shape[0]
    C = bigd.shape[1]                     # L * rows
    L = C // rows
    assert L == 8 - drop, (L, drop)
    block_m = min(block_m, M)
    gc = combos_per_cell
    if gc is None:
        # measured on-chip: grouping 2 same-vi combos per cell pays on the
        # small extraction lattices (tiny per-combo matmuls); the main
        # lattice is VMEM-bound at its block size and stays ungrouped
        gc = 2 if (N <= 512 and rows % 2 == 0) else 1
    while rows % gc:
        gc -= 1
    grid = (pl.cdiv(M, block_m), J, C // gc)
    kernel = functools.partial(_fused_ext_kernel, n_poly=N, rows=rows, L=L,
                               drop=drop, dbytes=2, block_m=block_m,
                               cross=cross, gc=gc)
    RB = rows // gc
    spec_db = pl.BlockSpec((gc, block_m, N), lambda m, j, c: (c % RB, m, 0),
                           memory_space=pltpu.VMEM)
    spec_big = pl.BlockSpec(
        (1, gc, 128, 2 * N - 128),
        lambda m, j, c: (j, c, 0, 0),
        memory_space=pltpu.VMEM)
    # acc inputs stay in HBM; the first cell DMAs them into the out blocks
    spec_any = pl.BlockSpec(memory_space=pl.ANY)
    spec_out = pl.BlockSpec((1, block_m, N), lambda m, j, c: (j, m, 0),
                            memory_space=pltpu.VMEM)
    ohi, olo = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec_db, spec_db, spec_big, spec_any, spec_any],
        out_specs=[spec_out, spec_out],
        out_shape=[jax.ShapeDtypeStruct((J, M, N), U32)] * 2,
        scratch_shapes=[
            pltpu.VMEM((2, block_m, N), jnp.int32),  # sliding bucket window
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(dB0, dB1, bigd, acc_hi, acc_lo)
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
