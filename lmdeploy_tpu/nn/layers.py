"""Core transformer layer primitives (functional).

Reference analog: ``lmdeploy/pytorch/nn/`` (RMSNorm, SiLU fused MLP, rotary embedding
variants ``nn/rotary_embedding.py``: default / linear / dynamic-NTK / llama3 / yarn).
These are deliberately plain jnp: XLA fuses norm+matmul+activation chains well on TPU,
so Pallas is reserved for the paged-attention and quantized-GEMM hot loops.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    dtype = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    x = x * jax.lax.rsqrt(var + eps)
    return (x * weight.astype(jnp.float32)).astype(dtype)


def silu_mlp(x: jax.Array, gate_up: jax.Array, down: jax.Array) -> jax.Array:
    """Fused gate/up projection + SiLU + down projection (llama-family MLP)."""
    gu = jnp.dot(x, gate_up, preferred_element_type=jnp.float32)
    gate, up = jnp.split(gu, 2, axis=-1)
    act = jax.nn.silu(gate) * up
    return jnp.dot(act.astype(x.dtype), down, preferred_element_type=jnp.float32
                   ).astype(x.dtype)


# -- rotary embeddings ------------------------------------------------------------------

def _rope_base_frequencies(head_dim: int, theta: float) -> jnp.ndarray:
    exponents = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
    return 1.0 / (theta ** exponents)          # [D/2]


def _llama3_scaling(inv_freq: jnp.ndarray, scaling: Dict[str, Any]) -> jnp.ndarray:
    """Llama-3.1 frequency-dependent NTK scaling (reference: nn/rotary_embedding.py)."""
    factor = scaling.get('factor', 8.0)
    low_freq_factor = scaling.get('low_freq_factor', 1.0)
    high_freq_factor = scaling.get('high_freq_factor', 4.0)
    old_len = scaling.get('original_max_position_embeddings', 8192)
    low_wavelen = old_len / low_freq_factor
    high_wavelen = old_len / high_freq_factor
    wavelen = 2 * math.pi / inv_freq
    scaled = jnp.where(wavelen > low_wavelen, inv_freq / factor, inv_freq)
    smooth = (old_len / wavelen - low_freq_factor) / (high_freq_factor - low_freq_factor)
    mid = (1 - smooth) * inv_freq / factor + smooth * inv_freq
    is_mid = (wavelen <= low_wavelen) & (wavelen >= high_wavelen)
    return jnp.where(is_mid, mid, scaled)


def make_rope_table(head_dim: int, max_len: int, theta: float = 10000.0,
                    rope_scaling: Optional[Dict[str, Any]] = None,
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Precompute (cos, sin) tables [max_len, D/2] in f32, honoring HF rope_scaling."""
    inv_freq = _rope_base_frequencies(head_dim, theta)
    attn_factor = 1.0
    positions = jnp.arange(max_len, dtype=jnp.float32)
    if rope_scaling:
        rtype = rope_scaling.get('rope_type') or rope_scaling.get('type') or 'default'
        if rtype == 'linear':
            positions = positions / rope_scaling.get('factor', 1.0)
        elif rtype == 'llama3':
            inv_freq = _llama3_scaling(inv_freq, rope_scaling)
        elif rtype == 'dynamic':
            # dynamic NTK: rescale theta for the full table length
            factor = rope_scaling.get('factor', 1.0)
            base = theta * (factor * max_len /
                            rope_scaling.get('original_max_position_embeddings', max_len)
                            - (factor - 1)) ** (head_dim / (head_dim - 2))
            inv_freq = _rope_base_frequencies(head_dim, base)
        elif rtype in ('longrope', 'su'):
            # Phi-3 LongRoPE: per-frequency rescale factors, short table for
            # within-original contexts, long table beyond; attention scaled by
            # sqrt(1 + log(s)/log(orig)) (HF modeling_phi3)
            orig = rope_scaling.get('original_max_position_embeddings', max_len)
            factors = rope_scaling.get('long_factor') if max_len > orig \
                else rope_scaling.get('short_factor')
            if factors is not None:
                inv_freq = inv_freq / jnp.asarray(factors, jnp.float32)
            scale = max_len / max(orig, 1)
            if scale > 1.0:
                attn_factor = math.sqrt(1.0 + math.log(scale) / math.log(orig))
        elif rtype == 'yarn':
            factor = rope_scaling.get('factor', 1.0)
            orig = rope_scaling.get('original_max_position_embeddings', 4096)
            beta_fast = rope_scaling.get('beta_fast', 32.0)
            beta_slow = rope_scaling.get('beta_slow', 1.0)

            def find_dim(num_rot):
                return (head_dim * math.log(orig / (num_rot * 2 * math.pi))) / \
                    (2 * math.log(theta))
            low = max(math.floor(find_dim(beta_fast)), 0)
            high = min(math.ceil(find_dim(beta_slow)), head_dim - 1)
            rng = jnp.arange(head_dim // 2, dtype=jnp.float32)
            ramp = jnp.clip((rng - low) / max(high - low, 1e-3), 0, 1)
            mask = 1.0 - ramp
            inv_freq = inv_freq / factor * (1 - mask) + inv_freq * mask
            mscale = rope_scaling.get('mscale', 1.0)
            if mscale:
                attn_factor = 0.1 * mscale * math.log(factor) + 1.0 if factor > 1 else 1.0
    angles = positions[:, None] * inv_freq[None, :]        # [max_len, D/2]
    return jnp.cos(angles) * attn_factor, jnp.sin(angles) * attn_factor


def gather_mrope(rope_cos: jax.Array, rope_sin: jax.Array, pos3: jax.Array,
                 sections: Tuple[int, ...],
                 interleaved: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Multimodal rope (Qwen2-VL family): 3-component (t, h, w) position ids
    select per-frequency-section rows of the standard rope tables.

    pos3: [B, T, 3] int32.  sections: config ``mrope_section`` — frequency
    counts per component over the D/2 half-dim (e.g. [16, 24, 24]).  Returns
    (cos, sin) [B, T, D/2]: cos[b,t,d] = rope_cos[pos3[b,t,comp(d)], d].
    Three table gathers + a select — trivial next to the layer matmuls.

    Reference analog: ``lmdeploy/pytorch/models/qwen2_vl.py`` mrope_position_ids
    path (:266-270) over ``nn/rotary_embedding.py`` mrope sections.
    """
    half = rope_cos.shape[-1]
    if interleaved:
        # Qwen3-VL lane-interleaved layout: T,H,W,T,H,W..., H/W lanes only up
        # to 3*section (reference rotary_embedding.apply_interleaved_mrope)
        import numpy as np
        c = np.zeros(half, np.int32)
        for dim, offset in ((1, 1), (2, 2)):
            length = min(sections[dim] * 3, half)
            c[offset:length:3] = dim
        comp = jnp.asarray(c)
    else:
        comp = jnp.concatenate([
            jnp.full((s,), i, jnp.int32) for i, s in enumerate(sections)])
        assert comp.shape[0] == half, (sections, half)
    cs = [(rope_cos[pos3[..., i]], rope_sin[pos3[..., i]]) for i in range(3)]
    cos = jnp.where(comp == 0, cs[0][0], jnp.where(comp == 1, cs[1][0], cs[2][0]))
    sin = jnp.where(comp == 0, cs[0][1], jnp.where(comp == 1, cs[1][1], cs[2][1]))
    return cos, sin


def apply_rope(q: jax.Array, k: jax.Array, cos: jax.Array, sin: jax.Array,
               ) -> Tuple[jax.Array, jax.Array]:
    """Rotate q/k. q: [B,T,Hq,D], k: [B,T,Hkv,D], cos/sin: [B,T,D/2].

    Uses the HF "rotate_half" layout (first/second half pairing), matching how llama
    checkpoints store Wq/Wk.
    """
    def rot(x):
        d2 = x.shape[-1] // 2
        x1, x2 = x[..., :d2], x[..., d2:]
        c = cos[:, :, None, :]
        s = sin[:, :, None, :]
        xf1 = x1.astype(jnp.float32)
        xf2 = x2.astype(jnp.float32)
        return jnp.concatenate([xf1 * c - xf2 * s, xf2 * c + xf1 * s],
                               axis=-1).astype(x.dtype)
    return rot(q), rot(k)
