"""Fake-quantization primitives for QAT (straight-through / LSQ).

Reproduces the Brevitas semantics the reference relies on
(reference models/backbone.py:217-227):

* weights  — per-tensor float scale, signed symmetric, ``narrow_range=True``
  (range [-(2^(b-1)-1), 2^(b-1)-1]), scale derived from max|w| each step
  (Int8WeightPerTensorFloat with ``weight_bit_width`` override).
* activations — per-tensor float *learned* scale:
  - ``QuantIdentity`` (Int8ActPerTensorFloat): signed, range
    [-2^(b-1), 2^(b-1)-1];
  - ``QuantReLU``: unsigned, range [0, 2^b - 1].

The learned activation scales use the LSQ gradient estimator (Esser et al.,
2020) — scale is a free parameter with a straight-through rounding gradient,
which matches Brevitas' learned-scale behavior in effect (we train from
scratch, so init details need not be bit-identical).

All functions are shape-polymorphic, jit-friendly, and run on the VPU.
"""
from functools import partial

import jax
import jax.numpy as jnp


def weight_scale(w: jax.Array, bits: int) -> jax.Array:
    """Per-tensor symmetric narrow-range weight scale: max|w| / (2^(b-1)-1)."""
    qmax = 2 ** (bits - 1) - 1
    return jnp.maximum(jnp.max(jnp.abs(w)), 1e-8) / qmax


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _fake_quant(x, scale, qmin, qmax):
    q = jnp.clip(jnp.round(x / scale), qmin, qmax)
    return q * scale


def _fake_quant_fwd(x, scale, qmin, qmax):
    return _fake_quant(x, scale, qmin, qmax), (x, scale)


def _fake_quant_bwd(qmin, qmax, res, g):
    x, scale = res
    xs = x / scale
    in_range = (xs >= qmin) & (xs <= qmax)
    # STE for x inside range
    gx = jnp.where(in_range, g, 0.0)
    # LSQ gradient for the scale
    q = jnp.round(xs)
    ds = jnp.where(in_range, q - xs, jnp.clip(xs, qmin, qmax))
    grad_scale = 1.0 / jnp.sqrt(jnp.asarray(x.size, x.dtype) * qmax)
    gscale = jnp.sum(g * ds) * grad_scale
    return gx, gscale


_fake_quant.defvjp(_fake_quant_fwd, _fake_quant_bwd)


def fake_quant_weight(w: jax.Array, bits: int) -> jax.Array:
    """Brevitas-style weight fake-quant (scale from stats, STE)."""
    qmax = 2 ** (bits - 1) - 1
    scale = jax.lax.stop_gradient(weight_scale(w, bits))
    # STE on rounding; scale is data-derived (stop-grad) as in Brevitas'
    # statistics-based weight scaling.
    return _fake_quant(w, scale, -qmax, qmax)


def quantize_weight_int(w: jax.Array, bits: int):
    """Integer weight + scale for circuit lowering (inference-time)."""
    qmax = 2 ** (bits - 1) - 1
    scale = weight_scale(w, bits)
    w_int = jnp.clip(jnp.round(w / scale), -qmax, qmax).astype(jnp.int32)
    return w_int, scale


def fake_quant_act_signed(x: jax.Array, scale: jax.Array, bits: int) -> jax.Array:
    """QuantIdentity: signed per-tensor learned-scale fake quant."""
    qmax = 2 ** (bits - 1) - 1
    qmin = -(2 ** (bits - 1))
    s = jnp.maximum(scale, 1e-8)
    return _fake_quant(x, s, qmin, qmax)


def fake_quant_relu(x: jax.Array, scale: jax.Array, bits: int) -> jax.Array:
    """QuantReLU: unsigned fake quant (clamps negatives to 0)."""
    qmax = 2 ** bits - 1
    s = jnp.maximum(scale, 1e-8)
    return _fake_quant(x, s, 0, qmax)


def act_qrange(bits: int, signed: bool, relu: bool):
    if relu:
        return 0, 2 ** bits - 1
    if signed:
        return -(2 ** (bits - 1)), 2 ** (bits - 1) - 1
    return 0, 2 ** bits - 1
