#!/usr/bin/env python
"""Independent quality-100 JPEG coefficient oracle for fs=8 golden parity.

The reference's ``filter_size == 8`` codec path runs libjpeg-turbo (encode at
quality 100, 4:2:0) and parses the DCT coefficients straight from the
bitstream with jpeg2dct (reference data/cvfunctional.py:21-26).  Neither
wheel exists in this sandbox — but PIL's JPEG encoder IS libjpeg, so the
real encoder is available; what is missing is the coefficient *reader*.

This module provides:

* :func:`encode_like_turbojpeg` — byte-for-byte what the reference's
  ``TurboJPEG().encode(img, quality=100, jpeg_subsample=2)`` produces,
  including the reference's pixel-format quirk: PyTurboJPEG's ``encode``
  defaults to ``pixel_format=TJPF_BGR`` while the reference hands it an
  **RGB** array (dataset.py:19-31 converts BGR->RGB first), so libjpeg sees
  the channels reversed and computes Y = .299 B + .587 G + .114 R in true
  channel terms.  We reproduce that by reversing the channel axis before
  PIL encodes.
* :func:`parse_jpeg_coefficients` — a minimal baseline-JPEG entropy decoder
  that extracts the quantized DCT coefficients from the bitstream (the
  jpeg2dct.loads(normalized=True) equivalent): per-component
  (blocks_h, blocks_w, 64) int32 arrays in natural (row-major) block order,
  multiplied by the quantization table (identity at quality 100).

Together they regenerate the reference's fs=8 GetDCT output with the REAL
libjpeg forward path (integer islow FDCT, fixed-point color conversion,
biased h2v2 downsample) as ground truth, independent of the JAX codec
implementation being tested.
"""
import io

import numpy as np

# JPEG zigzag scan order: zigzag index -> natural (row-major) index
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], np.int32)


def encode_like_turbojpeg(img_rgb: np.ndarray, quality: int = 100,
                          subsampling: int = 2) -> bytes:
    """JPEG bytes as the reference's TurboJPEG().encode(img, 100, 2) call.

    ``subsampling`` follows TJSAMP/PIL numbering (2 = 4:2:0).  The channel
    reversal reproduces PyTurboJPEG's TJPF_BGR default applied to the
    reference's RGB input (see module docstring).
    """
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(np.ascontiguousarray(img_rgb[..., ::-1])).save(
        buf, "JPEG", quality=quality, subsampling=subsampling)
    return buf.getvalue()


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self):
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.bitbuf = (self.bitbuf << 8) | 0
                self.nbits += 8
                continue
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1          # stuffed byte
                else:
                    # marker (EOI): feed zeros from here on
                    self.pos = len(self.data)
                    b = 0
            self.bitbuf = (self.bitbuf << 8) | b
            self.nbits += 8

    def get(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill()
        v = (self.bitbuf >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.bitbuf &= (1 << self.nbits) - 1
        return v


class _Huff:
    """Canonical JPEG Huffman table: (length, code) -> symbol."""

    def __init__(self, counts, symbols):
        self.lut = {}
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(counts[ln - 1]):
                self.lut[(ln, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | br.get(1)
            sym = self.lut.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("bad Huffman code")


def _extend(v: int, t: int) -> int:
    """JPEG EXTEND: t-bit magnitude v -> signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def parse_jpeg_coefficients(data: bytes):
    """Baseline JPEG -> per-component quantized-coefficient arrays.

    Returns a list of (blocks_h, blocks_w, 64) int32 arrays (one per SOF
    component, e.g. [Y, Cb, Cr]) in natural row-major band order, scaled by
    the component's quantization table — exactly jpeg2dct.numpy.loads's
    ``normalized=True`` output.  Supports baseline sequential JPEGs without
    restart markers (what libjpeg emits for the reference's encode call);
    image dims must fill whole MCUs (the reference crops to multiples of
    the 16x16 MCU before encoding).
    """
    assert data[0:2] == b"\xff\xd8", "not a JPEG"
    i = 2
    qtabs: dict[int, np.ndarray] = {}
    huffs: dict[tuple, _Huff] = {}
    comps = None
    scan = None
    h = w = 0
    while i < len(data):
        assert data[i] == 0xFF, f"marker sync lost at {i}"
        m = data[i + 1]
        if m == 0xD9:
            break
        ln = (data[i + 2] << 8) | data[i + 3]
        seg = data[i + 4:i + 2 + ln]
        if m == 0xDB:                                  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                n = 64
                if pq:
                    tb = np.frombuffer(seg[j + 1:j + 1 + 128],
                                       ">u2").astype(np.int32)
                    j += 1 + 128
                else:
                    tb = np.frombuffer(seg[j + 1:j + 1 + n],
                                       np.uint8).astype(np.int32)
                    j += 1 + n
                qtabs[tq] = tb                          # zigzag order
        elif m == 0xC0:                                # SOF0 baseline
            h = (seg[1] << 8) | seg[2]
            w = (seg[3] << 8) | seg[4]
            comps = []
            for c in range(seg[5]):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
        elif m in (0xC1, 0xC2, 0xC3):
            raise ValueError(f"unsupported SOF type {m:02X} (baseline only)")
        elif m == 0xC4:                                # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                counts = list(seg[j + 1:j + 17])
                nsym = sum(counts)
                syms = list(seg[j + 17:j + 17 + nsym])
                huffs[(tc, th)] = _Huff(counts, syms)
                j += 17 + nsym
        elif m == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif m == 0xDA:                                # SOS
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan.append({"cs": cs, "dc": tt >> 4, "ac": tt & 15})
            i = i + 2 + ln
            ecs = data[i:]
            break
        i += 2 + ln
    assert comps is not None and scan is not None, "no SOF/SOS found"

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    assert h % (8 * vmax) == 0 and w % (8 * hmax) == 0, (
        "partial MCUs unsupported — crop to MCU multiples first")
    mcus_y = h // (8 * vmax)
    mcus_x = w // (8 * hmax)

    out = []
    for c in comps:
        nbh = h * c["v"] // (8 * vmax)
        nbw = w * c["h"] // (8 * hmax)
        out.append(np.zeros((nbh, nbw, 64), np.int32))

    br = _BitReader(ecs)
    pred = [0] * len(comps)
    by_id = {c["id"]: k for k, c in enumerate(comps)}
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for sc in scan:
                k = by_id[sc["cs"]]
                comp = comps[k]
                dch = huffs[(0, sc["dc"])]
                ach = huffs[(1, sc["ac"])]
                for v in range(comp["v"]):
                    for u in range(comp["h"]):
                        blk = np.zeros(64, np.int64)
                        t = dch.decode(br)
                        pred[k] += _extend(br.get(t), t)
                        blk[0] = pred[k]
                        z = 1
                        while z < 64:
                            rs = ach.decode(br)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    z += 16          # ZRL
                                    continue
                                break                # EOB
                            z += r
                            blk[z] = _extend(br.get(s), s)
                            z += 1
                        nat = np.zeros(64, np.int64)
                        nat[ZIGZAG] = blk * qtabs[comp["tq"]]
                        by = my * comp["v"] + v
                        bx = mx * comp["h"] + u
                        out[k][by, bx] = nat
    return out


def transform_dct_oracle(img_rgb: np.ndarray):
    """The reference ``transform_dct`` (cvfunctional.py:21-26) re-created
    with the real libjpeg encoder + the bitstream parser above:
    returns (dct_y, dct_cb, dct_cr) int32 arrays (h/8, w/8, 64) /
    (h/16, w/16, 64)."""
    data = encode_like_turbojpeg(np.ascontiguousarray(img_rgb, np.uint8))
    y, cb, cr = parse_jpeg_coefficients(data)
    return y, cb, cr


if __name__ == "__main__":
    # self-check: parse -> inverse DCT must reproduce libjpeg's own decode
    from PIL import Image
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (64, 64, 3), np.uint8)
    data = encode_like_turbojpeg(img)
    y, cb, cr = parse_jpeg_coefficients(data)
    im = Image.open(io.BytesIO(data))
    im.draft("YCbCr", im.size)        # raw Y/Cb/Cr, no RGB roundtrip
    dec = np.asarray(im)

    import scipy.fft
    blocks = y.reshape(8, 8, 8, 8)                   # (by, bx, 64)
    pix = np.zeros((64, 64))
    for by in range(8):
        for bx in range(8):
            pix[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = scipy.fft.idctn(
                y[by, bx].reshape(8, 8), norm="ortho") + 128
    err = np.abs(pix - dec[..., 0].astype(np.float64))
    print("Y idct-vs-libjpeg-decode max err:", err.max())
    assert err.max() < 2.0, "parser disagrees with libjpeg decode"
    print("parser OK")
