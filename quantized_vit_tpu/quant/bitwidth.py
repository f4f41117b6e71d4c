"""Bit-width algebra shared by the quant layers and the GETA optimizer.

Reference formulas:
- bits(d, q_m, t) = log2(q_m^t / |d| + 1) + 1
  (quant_layers.py:383-410; geta.py:775-785 `_bit_width_helper`)
- d(bits, q_m, t) = q_m^t / (2^(bits-1) - 1)
  (geta.py:788-805 `_d_quant_helper`; quant_layers.py:413-440 init uses the
  same with t=1, q_s=0)
- clip(x, q_m, t)     — the float clip transform (geta.py:822-834)
- residual(x, d, q_m, t) — rounding residual in level space (geta.py:837-850)

All functions are jit-safe jnp ops (no Python math on traced values).
"""

from __future__ import annotations

import jax.numpy as jnp

from .lsfq import _safe_pow


def bit_width(d, q_m, t=None):
    """bits = log2(|q_m|^t / |d| + 1) + 1. Returns float; round for int bits."""
    if t is None:
        t = 1.0
    qpow = _safe_pow(jnp.abs(q_m), t)
    return jnp.log2(qpow / jnp.abs(d) + 1.0) + 1.0


def d_for_bits(bits, q_m, t=None):
    """Step size achieving ``bits`` levels over |q_m|^t: d = |q_m|^t/(2^(b-1)-1)."""
    if t is None:
        t = 1.0
    q_abs = jnp.maximum(jnp.abs(q_m), 1e-10)
    return _safe_pow(q_abs, t) / (2.0**(bits - 1.0) - 1.0)


def init_quant_params(weight, num_bits: float, nonlinear: bool = False):
    """Initial (d, q_m[, t]) for a layer: q_m = max|W|, d = q_m/(2^(b-1)-1),
    t = 1 (quant_layers.py:413-440)."""
    q_m = jnp.max(jnp.abs(weight))
    d = (q_m - 0.0) / (2.0 ** (float(num_bits) - 1.0) - 1.0)
    if nonlinear:
        return d.reshape(1), q_m.reshape(1), jnp.ones((1,), weight.dtype)
    return d.reshape(1), q_m.reshape(1)


def clip_transform(x, q_m, t=None, q_s=0.0):
    """sign(x) * clip((|x|-q_s)^t, 0, (q_m-q_s)^t) (geta.py:822-834).

    Mask precedence matches the reference: >= q_m applied after <= q_s.
    """
    if t is None:
        t = 1.0
    x_abs = jnp.abs(x)
    range_pow = _safe_pow(jnp.abs(q_m - q_s), t)
    input_pow = _safe_pow(x_abs - q_s, t)
    out = jnp.where(x_abs <= q_s, 0.0, input_pow)
    out = jnp.where(x_abs >= q_m, range_pow, out)
    return jnp.sign(x) * out


def quant_residual(x, d, q_m, t=None, q_s=0.0):
    """sign(x) * (round(p/d) - p/d) with p the clipped power transform
    (geta.py:837-850). This is the residual whose inner product with the
    gradient drives GETA's forget-rate γ."""
    if t is None:
        t = 1.0
    x_abs = jnp.abs(x)
    range_pow = _safe_pow(jnp.abs(q_m - q_s), t)
    input_pow = _safe_pow(x_abs - q_s, t)
    res = jnp.round(input_pow / d) - input_pow / d
    res = jnp.where(x_abs >= q_m, jnp.round(range_pow / d) - range_pow / d, res)
    res = jnp.where(x_abs <= q_s, 0.0, res)
    return jnp.sign(x) * res


def quantize_simple(x, d, q_m, t=None, q_s=0.0):
    """Forward-only quantization (geta.py:807-820 `_quantize_helper`) —
    identical value to lsfq_nonlinear but without the custom VJP or the
    +1e-6 range guard the training quantizer applies."""
    if t is None:
        t = 1.0
    x_abs = jnp.abs(x)
    range_pow = _safe_pow(jnp.abs(q_m - q_s), t)
    input_pow = _safe_pow(x_abs - q_s, t)
    out = d * jnp.round(input_pow / d)
    out = jnp.where(x_abs <= q_s, 0.0, out)
    out = jnp.where(x_abs >= q_m, d * jnp.round(range_pow / d), out)
    return jnp.sign(x) * out
