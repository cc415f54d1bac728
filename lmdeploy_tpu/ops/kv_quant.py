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
    """int8 pages [L, Hkv, NB, BS, Dp] + f32 scales [L, Hkv, NB, BS]."""

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


def quantize_rows(x: jax.Array, eps: float = 1e-8):
    """[..., D] -> (int8 [..., D], f32 scale [...]) with per-row absmax/127."""
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=-1) / 127.0 + eps
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def dequantize(data: jax.Array, scale: jax.Array) -> jax.Array:
    """int8 [..., D] * f32 [...] -> f32 [..., D]."""
    return data.astype(jnp.float32) * scale[..., None]
