"""Bit-exact libjpeg quality-100 forward path (the filter_size == 8 codec).

The reference's fs=8 DCT ingest JPEG-encodes each image at quality 100 with
4:2:0 subsampling and reads the DCT coefficients back from the bitstream
(reference data/cvfunctional.py:21-26, via libjpeg-turbo + jpeg2dct).  At
quality 100 every quantization step is 1, so the coefficients are exactly
what libjpeg's *integer* forward pipeline computes:

  1. fixed-point RGB -> YCbCr (jccolor.c: 16-bit FIX() tables, floor shift);
  2. h2v2 chroma downsample with the 1,2,1,2 alternating bias
     (jcsample.c h2v2_downsample — NOT round-half-even of the mean);
  3. level shift -128;
  4. jpeg_fdct_islow (jfdctint.c): the Loeffler-Ligtenberg-Moshovitz
     13-bit fixed-point 8x8 DCT, output scaled by 8;
  5. quantization by 8 (qval 1 << 3) with round-half-away-from-zero.

None of these match a float-orthonormal-DCT-then-round emulation bitwise
(the golden parity work on the fs=4 path showed +-1 pixel-stage drift moves
most normalized features), so this module reproduces the integer pipeline
exactly, batched in int32 on the VPU — elementwise butterflies over
(B, nh, nw, 8, 8) blocks; no data-dependent control flow, jit-friendly.

One behavioral quirk is deliberately preserved: the reference passes an
**RGB** array to PyTurboJPEG's ``encode`` whose ``pixel_format`` defaults
to ``TJPF_BGR`` (dataset.py:19-31 converts to RGB; cvfunctional.py:24 never
overrides the format), so libjpeg reads the channels reversed and computes
Y = .299 B + .587 G + .114 R in true-channel terms.  ``rgb_to_ycbcr_libjpeg``
reproduces the swap.  Golden parity vs the real libjpeg encoder (via PIL +
the bitstream parser in tools/jpeg_oracle.py) is pinned by
tests/test_codec_golden.py.
"""
import jax
import jax.numpy as jnp

I32 = jnp.int32

# jccolor.c FIX() constants: round(x * 2^16)
_R_Y, _G_Y, _B_Y = 19595, 38470, 7471
_R_CB, _G_CB, _B_CB = 11059, 21709, 32768
_R_CR, _G_CR, _B_CR = 32768, 27439, 5329
_ONE_HALF = 1 << 15
_CBCR_OFFSET = 128 << 16


def rgb_to_ycbcr_libjpeg(x: jax.Array) -> tuple:
    """uint8 RGB (..., 3) -> (Y, Cb, Cr) int32 planes, jccolor.c semantics.

    Reads the channels reversed (see module docstring): libjpeg's "R" is
    the array's B channel and vice versa.
    """
    xi = x.astype(I32)
    r, g, b = xi[..., 2], xi[..., 1], xi[..., 0]   # TJPF_BGR-on-RGB quirk
    y = (_R_Y * r + _G_Y * g + (_B_Y * b + _ONE_HALF)) >> 16
    cb = (-_R_CB * r - _G_CB * g
          + (_B_CB * b + _CBCR_OFFSET + _ONE_HALF - 1)) >> 16
    cr = ((_R_CR * r + _CBCR_OFFSET + _ONE_HALF - 1)
          - _G_CR * g - _B_CR * b) >> 16
    return y, cb, cr


def h2v2_downsample(p: jax.Array) -> jax.Array:
    """jcsample.c h2v2_downsample: (..., H, W) int -> (..., H/2, W/2).

    out = (p00 + p01 + p10 + p11 + bias) >> 2 with bias alternating
    1, 2, 1, 2, ... along each output row ("trick to avoid systematic
    bias toward larger output values", jcsample.c) — distinct from both
    floor and round-half-even of the mean.
    """
    *lead, h, w = p.shape
    v = p.reshape(*lead, h // 2, 2, w // 2, 2).sum(axis=(-3, -1))
    bias = 1 + (jnp.arange(w // 2, dtype=I32) & 1)
    return (v + bias) >> 2


# jfdctint.c FIX() constants: round(x * 2^13)
_C = dict(c0298=2446, c0390=3196, c0541=4433, c0765=6270, c0899=7373,
          c1175=9633, c1501=12299, c1847=15137, c1961=16069, c2053=16819,
          c2562=20995, c3072=25172)
_CONST_BITS = 13
_PASS1_BITS = 2


def _descale(x, n):
    return (x + (1 << (n - 1))) >> n


def _fdct_pass(d, first: bool):
    """One butterfly pass of jpeg_fdct_islow along the LAST axis.

    d: (..., 8) int32.  Pass 1 leaves results scaled up by 2^PASS1_BITS;
    pass 2 removes that scaling.  Returns (..., 8).
    """
    tmp0 = d[..., 0] + d[..., 7]
    tmp7 = d[..., 0] - d[..., 7]
    tmp1 = d[..., 1] + d[..., 6]
    tmp6 = d[..., 1] - d[..., 6]
    tmp2 = d[..., 2] + d[..., 5]
    tmp5 = d[..., 2] - d[..., 5]
    tmp3 = d[..., 3] + d[..., 4]
    tmp4 = d[..., 3] - d[..., 4]

    tmp10 = tmp0 + tmp3
    tmp13 = tmp0 - tmp3
    tmp11 = tmp1 + tmp2
    tmp12 = tmp1 - tmp2

    if first:
        o0 = (tmp10 + tmp11) << _PASS1_BITS
        o4 = (tmp10 - tmp11) << _PASS1_BITS
        ds_even = _CONST_BITS - _PASS1_BITS
        ds_odd = _CONST_BITS - _PASS1_BITS
    else:
        o0 = _descale(tmp10 + tmp11, _PASS1_BITS)
        o4 = _descale(tmp10 - tmp11, _PASS1_BITS)
        ds_even = _CONST_BITS + _PASS1_BITS
        ds_odd = _CONST_BITS + _PASS1_BITS

    z1 = (tmp12 + tmp13) * _C["c0541"]
    o2 = _descale(z1 + tmp13 * _C["c0765"], ds_even)
    o6 = _descale(z1 - tmp12 * _C["c1847"], ds_even)

    z1 = tmp4 + tmp7
    z2 = tmp5 + tmp6
    z3 = tmp4 + tmp6
    z4 = tmp5 + tmp7
    z5 = (z3 + z4) * _C["c1175"]

    t4 = tmp4 * _C["c0298"]
    t5 = tmp5 * _C["c2053"]
    t6 = tmp6 * _C["c3072"]
    t7 = tmp7 * _C["c1501"]
    z1 = z1 * (-_C["c0899"])
    z2 = z2 * (-_C["c2562"])
    z3 = z3 * (-_C["c1961"]) + z5
    z4 = z4 * (-_C["c0390"]) + z5

    o7 = _descale(t4 + z1 + z3, ds_odd)
    o5 = _descale(t5 + z2 + z4, ds_odd)
    o3 = _descale(t6 + z2 + z3, ds_odd)
    o1 = _descale(t7 + z1 + z4, ds_odd)
    return jnp.stack([o0, o1, o2, o3, o4, o5, o6, o7], axis=-1)


def fdct_islow_q100_tiles(blocks: jax.Array) -> jax.Array:
    """(..., 8, 8) int32 pixel tiles -> (..., 64) q100 coefficients.

    The per-tile core of :func:`fdct_islow_q100`; also the unit the
    DCT-tile-parallel ingest shards across the mesh (codec.py
    ``dct_ingest_sharded``) — pure integer ops, so sharded == unsharded
    bit-exactly.
    """
    d = blocks.astype(I32) - 128                   # level shift
    d = _fdct_pass(d, first=True)                  # along columns-of-row
    d = jnp.swapaxes(d, -1, -2)
    d = _fdct_pass(d, first=False)                 # along rows
    d = jnp.swapaxes(d, -1, -2)                    # (..., u, v)
    # divide by 8, round half away from zero (jcdctmgr.c non-float quantize)
    mag = (jnp.abs(d) + 4) >> 3
    q = jnp.sign(d) * mag
    return q.reshape(*q.shape[:-2], 64)


def fdct_islow_q100(plane: jax.Array) -> jax.Array:
    """(..., H, W) int32 pixel plane -> (..., H/8, W/8, 64) q100 coefficients.

    Level shift, both islow passes (rows then columns, jfdctint.c), then
    the jcdctmgr quantization by qval*8 = 8 with round-half-away-from-zero
    — exactly the coefficients jpeg2dct reads back at quality 100.
    """
    *lead, h, w = plane.shape
    blocks = plane.astype(I32).reshape(*lead, h // 8, 8, w // 8, 8)
    blocks = jnp.moveaxis(blocks, -3, -2)          # (..., nh, nw, 8row, 8col)
    return fdct_islow_q100_tiles(blocks)


def jpeg_q100_coefficients(rgb_u8: jax.Array) -> tuple:
    """uint8 RGB (B, H, W, 3), H/W multiples of 16 -> (dct_y, dct_cb, dct_cr)
    int32 coefficient stacks ((B, H/8, W/8, 64) / half-res chroma) — the
    batched equivalent of the reference's ``transform_dct`` (GetDCT fs=8)."""
    y, cb, cr = rgb_to_ycbcr_libjpeg(rgb_u8)
    return (fdct_islow_q100(y),
            fdct_islow_q100(h2v2_downsample(cb)),
            fdct_islow_q100(h2v2_downsample(cr)))
