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
import numpy as np


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


# ---------------------------------------------------------------- TurboQuant --
# quant_policy=42 (reference QuantPolicy.TURBO_QUANT, messages.py:27): both K
# and V are Hadamard-rotated per head at fill time (outliers spread evenly, so
# aggressive per-coordinate codes survive), then coded per (token, head) row:
#   K: 4 bits/coord = 3-bit Lloyd-Max index on the L2-normalized row + the
#      sign bit of the code residual; meta = (mse_norm, qjl_norm)
#      dequant: k ~= mse_norm * (centroid[idx] + qjl_norm * sign)
#   V: 2 bits/coord = 2-bit Lloyd-Max index; meta = (norm, 0)
# Reference: kernels/cuda/turbo_quant.py:1-192 (rotation + baked codebooks),
# fill_kv_cache.py:325-515 (fill kernels), pagedattention.py:387-510
# (dequant-on-score), backends/cuda/attention/default.py:354-383 (q rotated
# into the cache domain, output rotated back).  Published cost: -7.3%
# throughput vs fp16 KV (docs/en/quantization/kv_quant.md:62-64).

# Lloyd-Max codebooks at sigma=1 (reference turbo_quant.py:164-186), scaled by
# 1/sqrt(d) at use (rotated-normalized rows are ~N(0, 1/d) per coordinate).
LLOYD_C3 = np.array([-2.1519456, -1.3439093, -0.7560052, -0.2450942,
                     0.2450942, 0.7560052, 1.3439093, 2.1519456], np.float32)
LLOYD_B3 = np.array([-1.7479274, -1.0499573, -0.5005497, 0.0,
                     0.5005497, 1.0499573, 1.7479274], np.float32)
LLOYD_C2 = np.array([-1.5104176, -0.4527808, 0.4527808, 1.5104176], np.float32)
LLOYD_B2 = np.array([-0.9815992, 0.0, 0.9815992], np.float32)

_HADAMARD_CACHE = {}


def hadamard(d: int) -> np.ndarray:
    """Normalized Walsh-Hadamard matrix Q = H/sqrt(d) (orthogonal, Q^-1 = Q^T;
    reference turbo_quant.py get_hadamard_matrix).  d must be a power of 2."""
    if d in _HADAMARD_CACHE:
        return _HADAMARD_CACHE[d]
    assert d & (d - 1) == 0, f'head_dim {d} not a power of 2'
    H = np.array([[1.0]], np.float32)
    while H.shape[0] < d:
        H = np.block([[H, H], [H, -H]])
    Q = (H / np.sqrt(d)).astype(np.float32)
    _HADAMARD_CACHE[d] = Q
    return Q


def hadamard_rotate(x: jax.Array) -> jax.Array:
    """Rotate the trailing head_dim axis: y = x @ Q^T (Q symmetric here, but
    keep the reference's convention)."""
    Q = jnp.asarray(hadamard(x.shape[-1]))
    return jnp.einsum('...d,ed->...e', x.astype(jnp.float32), Q)


def hadamard_rotate_inv(x: jax.Array) -> jax.Array:
    Q = jnp.asarray(hadamard(x.shape[-1]))
    return jnp.einsum('...d,de->...e', x.astype(jnp.float32), Q)


def _lloyd_index(u: jax.Array, boundaries: np.ndarray) -> jax.Array:
    """Code index per element: count of boundaries below (reference fill
    kernel's chain of (u > b_i) adds)."""
    idx = jnp.zeros(u.shape, jnp.uint8)
    for b in boundaries:
        idx = idx + (u > b).astype(jnp.uint8)
    return idx


def quantize_rows_turbo_k(k_rot: jax.Array, eps: float = 1e-8):
    """ALREADY-ROTATED K rows [..., D] -> (nibbles u8 0..15 [..., D],
    mse_norm [...], qjl_norm [...]).

    nibble = 3-bit Lloyd-Max index | (residual sign << 3); norms follow the
    reference fill kernel exactly (qjl_norm divided by sqrt(D))."""
    D = k_rot.shape[-1]
    xf = k_rot.astype(jnp.float32)
    mse_norm = jnp.sqrt(jnp.sum(xf * xf, axis=-1) + eps)
    u = xf / mse_norm[..., None]
    sigma = np.float32(1.0 / np.sqrt(D))
    idx = _lloyd_index(u, LLOYD_B3 * sigma)
    cent = jnp.asarray(LLOYD_C3 * sigma)[idx]
    r = u - cent
    sign = (r >= 0).astype(jnp.uint8)
    qjl_norm = jnp.sqrt(jnp.sum(r * r, axis=-1) + eps) / np.float32(np.sqrt(D))
    return idx | (sign << 3), mse_norm, qjl_norm


def dequantize_turbo_k(nib: jax.Array, mse_norm: jax.Array,
                       qjl_norm: jax.Array) -> jax.Array:
    """u8 nibbles [..., D] -> rotated-domain K (reference pagedattention.py
    _k4v2 dequant: mse_norm * (centroid + qjl_norm * sign))."""
    D = nib.shape[-1]
    sigma = np.float32(1.0 / np.sqrt(D))
    cent = jnp.asarray(LLOYD_C3 * sigma)[(nib & 0x7).astype(jnp.int32)]
    sign = ((nib >> 3) & 0x1).astype(jnp.float32) * 2.0 - 1.0
    return mse_norm[..., None] * (cent + qjl_norm[..., None] * sign)


def quantize_rows_turbo_v(v_rot: jax.Array, eps: float = 1e-8):
    """ALREADY-ROTATED V rows [..., D] -> (codes u8 0..3 [..., D], norm [...])."""
    D = v_rot.shape[-1]
    xf = v_rot.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(xf * xf, axis=-1) + eps)
    u = xf / norm[..., None]
    sigma = np.float32(1.0 / np.sqrt(D))
    return _lloyd_index(u, LLOYD_B2 * sigma), norm


def dequantize_turbo_v(code: jax.Array, norm: jax.Array) -> jax.Array:
    D = code.shape[-1]
    sigma = np.float32(1.0 / np.sqrt(D))
    return norm[..., None] * jnp.asarray(LLOYD_C2 * sigma)[code.astype(jnp.int32)]


@jax.tree_util.register_pytree_node_class
class QuantKVTurbo:
    """TurboQuant k4v2 cache (quant_policy=42).

    ``data``  u8 [L, NB, 2, BS, ROWp] — K plane: one nibble per coordinate,
              token-pair-packed like QuantKV4 is NOT used here; instead each
              token's K row packs coordinate pairs (d, d + D/2) into one byte
              (low nibble = d, high = d + D/2), so a row uses Hkv*D/2 bytes.
              V plane: 4 coords/byte ((d, d+D/4, d+D/2, d+3D/4) at bit pairs),
              Hkv*D/4 bytes.  ROWp = lane-padded Hkv*D/2.
    ``meta``  f32 [L, NB, 2, 2, Hkv, BS] — [.., 0, :, :] = (K: mse_norm,
              V: norm), [.., 1, :, :] = (K: qjl_norm, V: unused).

    ``.shape`` reports the LOGICAL [L, NB, 2, BS, ROWp] geometry (slot dim =
    true block size) — see the QuantKV4 shape lesson.
    """

    def __init__(self, data, meta):
        self.data = data
        self.meta = meta

    @property
    def shape(self):
        return self.data.shape

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def nbytes(self):
        return self.data.nbytes + self.meta.nbytes

    def tree_flatten(self):
        return (self.data, self.meta), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)
