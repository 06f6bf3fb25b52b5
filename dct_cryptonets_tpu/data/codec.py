"""Batched on-device DCT ingest pipeline.

The reference runs its codec per-sample in 4-8 DataLoader worker processes
(libjpeg-turbo / jpeg2dct / OpenCV; reference data/datamgr.py:150-220,
data/cvfunctional.py:21-74).  Here the *entire* pipeline is a single jittable
JAX function over a uint8 image batch, so it runs on-device, fuses into the
training step, and batches the per-tile DCTs onto the MXU:

    uint8 RGB (B, H, W, 3)
      -> resize(1.15 * fs * S) -> center-crop(fs * S)          [eval path]
      -> YCbCr split + 2x chroma downsample
      -> blockwise S x S orthonormal DCT-II  (ops.dct, MXU)
      -> bilinear upscale of coefficient maps to (S, S)
      -> low-frequency channel subset (tables.subset_indices)
      -> concat Y|Cb|Cr -> per-channel normalization (tables.normalization_stats)
      -> float32 (B, S, S, C)   [NHWC — TPU-native layout]

Two chroma conventions are matched to the reference:
  * ``filter_size != 8`` (manual path, cvfunctional.py:59-74): OpenCV YCrCb
    coefficients; NOTE the reference splits YCrCb as ``y, cb, cr`` so its
    "cb" is actually Cr — we reproduce that swap.
  * ``filter_size == 8`` (JPEG path, cvfunctional.py:21-26): libjpeg BT.601
    YCbCr, 2x2 box 4:2:0 downsample, integer-rounded quality-100 coefficients.
"""
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.dct import blockwise_dct2
from .tables import normalization_stats, subset_indices


@dataclass(frozen=True)
class CodecConfig:
    """Static configuration of the DCT ingest pipeline.

    Field names mirror the reference CLI flags (io_utils.py:33-42).
    """
    channels: int = 24          # low-frequency channel budget across Y/Cb/Cr
    filter_size: int = 4        # DCT tile size S_f
    image_size_dct: int = 16    # spatial size S of the coefficient maps
    dct_pattern: str = "default"

    @property
    def pixel_size(self) -> int:
        return self.filter_size * self.image_size_dct

    def subset(self):
        return subset_indices(self.channels, self.dct_pattern, self.filter_size)

    def stats(self):
        return normalization_stats(self.channels)


# ---------------------------------------------------------------------------
# color conversion


def rgb_to_ycrcb_cv(x: jax.Array) -> jax.Array:
    """OpenCV-convention RGB -> (Y, Cr, Cb), uint8-rounded, channel-last.

    Matches cv2.cvtColor(..., COLOR_BGR2YCrCb) on an RGB-ordered array as the
    reference constructs it (cvfunctional.py:64-65): Y = BT.601 luma,
    Cr = (R - Y) * 0.713 + 128, Cb = (B - Y) * 0.564 + 128.
    """
    x = x.astype(jnp.float32)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cr = (r - y) * 0.713 + 128.0
    cb = (b - y) * 0.564 + 128.0
    out = jnp.stack([y, cr, cb], axis=-1)
    return jnp.clip(jnp.round(out), 0, 255)


def rgb_to_ycbcr_jpeg(x: jax.Array) -> jax.Array:
    """libjpeg BT.601 RGB -> (Y, Cb, Cr), used by the filter_size==8 path."""
    x = x.astype(jnp.float32)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    out = jnp.stack([y, cb, cr], axis=-1)
    return jnp.clip(jnp.round(out), 0, 255)


# ---------------------------------------------------------------------------
# spatial ops (cv2-bilinear semantics: half-pixel centers, no antialias)


def resize_bilinear(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Bilinear resize of (..., H, W, C) with half-pixel centers (cv2-like)."""
    shape = (*x.shape[:-3], out_h, out_w, x.shape[-1])
    return jax.image.resize(x.astype(jnp.float32), shape, method="linear",
                            antialias=False)


def center_crop(x: jax.Array, size: int) -> jax.Array:
    h, w = x.shape[-3], x.shape[-2]
    top = (h - size) // 2
    left = (w - size) // 2
    return x[..., top:top + size, left:left + size, :]


def box_downsample_2x(x: jax.Array) -> jax.Array:
    """2x2 box average (libjpeg h2v2 chroma downsample), rounded."""
    *lead, h, w = x.shape
    x = x.reshape(*lead, h // 2, 2, w // 2, 2)
    return jnp.round(x.mean(axis=(-3, -1)))


# ---------------------------------------------------------------------------
# core: pixels -> normalized DCT tensor


def _component_coeffs(plane: jax.Array, cfg: CodecConfig, rounded: bool) -> jax.Array:
    """(B, H, W) pixel plane -> (B, S, S, S_f^2) upscaled coefficient maps."""
    c = blockwise_dct2(plane, cfg.filter_size, level_shift=True,
                       round_coeffs=rounded)              # (B, nh, nw, S_f^2)
    S = cfg.image_size_dct
    if c.shape[-3] != S or c.shape[-2] != S:
        # UpScaleDCT (reference cvtransforms.py:56-64): bilinear resize of the
        # coefficient maps themselves to the common (S, S) spatial grid.
        c = resize_bilinear(c, S, S)
    return c


def dct_from_pixels(cropped: jax.Array, cfg: CodecConfig) -> jax.Array:
    """uint8 RGB (B, P, P, 3), P = filter_size * S -> normalized (B, S, S, C).

    Implements GetDCT -> UpScaleDCT -> SubsetDCT -> Aggregate -> NormalizeDCT
    (reference datamgr.py:193-220) as one fused batched function.
    """
    if cfg.filter_size == 8:
        ycc = rgb_to_ycbcr_jpeg(cropped)
        y = ycc[..., 0]
        cb = box_downsample_2x(ycc[..., 1])
        cr = box_downsample_2x(ycc[..., 2])
        rounded = True
    else:
        ycc = rgb_to_ycrcb_cv(cropped)
        y = ycc[..., 0]
        # Reference quirk (cvfunctional.py:66): `y, cb, cr = cv2.split(YCrCb)`
        # binds Cr to the "cb" slot.  Chroma is halved with cv2 bilinear.
        half = cropped.shape[-2] // 2
        cb = resize_bilinear(ycc[..., 1:2], half, half)[..., 0]
        cb = jnp.clip(jnp.round(cb), 0, 255)
        cr = resize_bilinear(ycc[..., 2:3], half, half)[..., 0]
        cr = jnp.clip(jnp.round(cr), 0, 255)
        rounded = False

    coeff_y = _component_coeffs(y, cfg, rounded)
    coeff_cb = _component_coeffs(cb, cfg, rounded)
    coeff_cr = _component_coeffs(cr, cfg, rounded)

    y_idx, cb_idx, cr_idx = cfg.subset()
    parts = [
        coeff_y[..., jnp.asarray(y_idx)],
        coeff_cb[..., jnp.asarray(cb_idx)],
        coeff_cr[..., jnp.asarray(cr_idx)],
    ]
    agg = jnp.concatenate(parts, axis=-1)                  # (B, S, S, C)

    mean, std = cfg.stats()
    return (agg - jnp.asarray(mean)) / jnp.asarray(std)


@partial(jax.jit, static_argnums=1)
def dct_ingest(images_u8: jax.Array, cfg: CodecConfig) -> jax.Array:
    """Eval-path ingest: Resize(1.15 P) -> CenterCrop(P) -> DCT pipeline.

    Mirrors the aug=False composed transform (reference datamgr.py:193-220).
    ``images_u8``: uint8 RGB, (B, H, W, 3).  Returns float32 (B, S, S, C).
    """
    P = cfg.pixel_size
    rs = int(P * 1.15)
    x = resize_bilinear(images_u8, rs, rs)
    x = jnp.clip(jnp.round(x), 0, 255)
    x = center_crop(x, P)
    return dct_from_pixels(x, cfg)


# ---------------------------------------------------------------------------
# training-path ingest with batched augmentation


def _random_resized_crop(key, images, out_size, scale=(0.08, 1.0),
                         ratio=(3.0 / 4.0, 4.0 / 3.0)):
    """Batched RandomResizedCrop via jax.image.scale_and_translate.

    Behavioral equivalent of reference cvtransforms RandomResizedCrop
    (cvtransforms.py, torchvision semantics): sample area in `scale`,
    log-uniform aspect in `ratio`, crop, resize to (out_size, out_size).
    Dynamic crop boxes are handled with static shapes by folding the crop
    into a scale-and-translate, which XLA lowers to a dense gather/matmul.
    """
    B, H, W, C = images.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    area = jax.random.uniform(k1, (B,), minval=scale[0], maxval=scale[1]) * (H * W)
    log_r = jax.random.uniform(k2, (B,), minval=np.log(ratio[0]), maxval=np.log(ratio[1]))
    r = jnp.exp(log_r)
    w = jnp.sqrt(area * r)
    h = jnp.sqrt(area / r)
    w = jnp.clip(w, 1.0, W)
    h = jnp.clip(h, 1.0, H)
    top = jax.random.uniform(k3, (B,)) * (H - h)
    left = jax.random.uniform(k4, (B,)) * (W - w)

    def one(img, h, w, top, left):
        sy = out_size / h
        sx = out_size / w
        return jax.image.scale_and_translate(
            img.astype(jnp.float32),
            (out_size, out_size, C),
            (0, 1),
            jnp.stack([sy, sx]),
            jnp.stack([-top * sy, -left * sx]),
            method="linear",
            antialias=False,
        )
    return jax.vmap(one)(images, h, w, top, left)


def _image_jitter(key, x, brightness=0.4, contrast=0.4, color=0.4):
    """Batched brightness/contrast/saturation jitter.

    Equivalent in effect to reference ImageJitter (cvtransforms.py, PIL
    enhancers with factor = alpha * U(-1, 1) + 1).  x: float (B, H, W, 3).
    """
    B = x.shape[0]
    kb, kc, ks = jax.random.split(key, 3)
    fb = 1.0 + brightness * (jax.random.uniform(kb, (B, 1, 1, 1)) * 2 - 1)
    fc = 1.0 + contrast * (jax.random.uniform(kc, (B, 1, 1, 1)) * 2 - 1)
    fs = 1.0 + color * (jax.random.uniform(ks, (B, 1, 1, 1)) * 2 - 1)
    x = x * fb
    gray = (0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2])[..., None]
    x = gray + (x - gray) * fs                      # saturation ("Color")
    mean = gray.mean(axis=(1, 2), keepdims=True)
    x = mean + (x - mean) * fc                      # contrast
    return jnp.clip(x, 0, 255)


@partial(jax.jit, static_argnums=2)
def dct_ingest_train(key: jax.Array, images_u8: jax.Array, cfg: CodecConfig) -> jax.Array:
    """Train-path ingest: RandomResizedCrop(P) -> jitter -> hflip -> DCT.

    Mirrors the aug=True composed transform (reference datamgr.py:150-191).
    """
    P = cfg.pixel_size
    kc, kj, kf = jax.random.split(key, 3)
    x = _random_resized_crop(kc, images_u8, P)
    x = _image_jitter(kj, x)
    flip = jax.random.bernoulli(kf, 0.5, (x.shape[0], 1, 1, 1))
    x = jnp.where(flip, x[:, :, ::-1, :], x)
    x = jnp.clip(jnp.round(x), 0, 255)
    return dct_from_pixels(x, cfg)
