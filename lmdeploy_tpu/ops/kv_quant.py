"""Per-token KV-cache quantization (reference: quant_policy 4, kv int8).

Reference analog: TurboMind's online KV quant (``kv_cache_utils_v2.cu``):
each token's K/V vector gets one scale per kv head, computed online at fill
time — no calibration pass.

``QuantKV`` wraps the int8 data pages plus the per-token scale pages as ONE
pytree node, so every cache consumer (scan carries, donation argnums, decode
state, cache swap) handles a quantized cache exactly like a plain array:
``.shape``/``.dtype`` proxy to the data pages.  fill_kv_cache quantizes on
write; the attention gather path dequantizes per gathered page row.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class QuantKV:
    """int8 unified pages [L, NB, BS, ROWp] + f32 scales
    [L, NB, 2, Hkv, BS] (index 2: 0 = K scales, 1 = V scales)."""

    def __init__(self, data, scale):
        self.data = data
        self.scale = scale

    @property
    def shape(self):
        return self.data.shape

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def nbytes(self):
        return self.data.nbytes + self.scale.nbytes

    def tree_flatten(self):
        return (self.data, self.scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.tree_util.register_pytree_node_class
class QuantKV4:
    """Asymmetric int4 KV pages (quant_policy=8, reference QuantPolicy int4).

    ``data``  u8 [L, NB, BS/2, ROWp] — "token-pair packing": byte (r, d)
              holds token slot 2r's weight in its low nibble and slot 2r+1's
              in the high nibble, keeping the lane dim at full width (a
              [*, ROWp/2] layout would be tile-padded back in HBM, erasing
              the 4-bit saving).
    ``scale`` f32 [L, NB, 2, Hkv, BS] — per-(token, head) step (index 2:
              0 = K, 1 = V), stored in *de-interleaved* page order
              ([even slots | odd slots]) so the decode kernel's score-side
              dequant needs no lane shuffles.
    ``minv``  f32 [L, NB, 2, Hkv, BS] — per-token minimum (same order).

    Dequant: x = q * scale + minv  (q in 0..15).
    """

    def __init__(self, data, scale, minv):
        self.data = data
        self.scale = scale
        self.minv = minv

    @property
    def shape(self):
        # LOGICAL geometry [L, NB, 2, BS, ROWp]: consumers read the token
        # capacity of a page from shape[3] (models compute slot mappings from
        # it), so the packed byte-row dim (BS/2) must not leak here.  That bug
        # scrambled every kv4 fill (caught by eval/ppl_gate.py: ppl 20 -> 924).
        d = self.data.shape
        return d[:3] + (d[3] * 2,) + d[4:]

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def nbytes(self):
        return self.data.nbytes + self.scale.nbytes + self.minv.nbytes

    def tree_flatten(self):
        return (self.data, self.scale, self.minv), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def deint_scale_pos(slot, block_size: int):
    """Token slot -> position in the de-interleaved per-page scale vector."""
    return (slot % 2) * (block_size // 2) + slot // 2


def quantize_rows(x: jax.Array, eps: float = 1e-8):
    """[..., D] -> (int8 [..., D], f32 scale [...]) with per-row absmax/127."""
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=-1) / 127.0 + eps
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def dequantize(data: jax.Array, scale: jax.Array) -> jax.Array:
    """int8 [..., D] * f32 [...] -> f32 [..., D]."""
    return data.astype(jnp.float32) * scale[..., None]


def quantize_rows_int4(x: jax.Array, eps: float = 1e-8):
    """[..., D] -> (u8 values 0..15 [..., D], f32 scale [...], f32 minv [...]).

    Per-row asymmetric min/max (reference: kv_cache_utils_v2.cu int4 path —
    per-head per-token asymmetric quant).
    """
    xf = x.astype(jnp.float32)
    mn = jnp.min(xf, axis=-1)
    mx = jnp.max(xf, axis=-1)
    scale = (mx - mn) / 15.0 + eps
    q = jnp.clip(jnp.round((xf - mn[..., None]) / scale[..., None]),
                 0, 15).astype(jnp.uint8)
    return q, scale, mn


def dequantize_int4(q: jax.Array, scale: jax.Array, minv: jax.Array) -> jax.Array:
    return q.astype(jnp.float32) * scale[..., None] + minv[..., None]
