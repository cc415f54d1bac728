"""Qwen3-VL / Qwen3-VL-MoE: ViT tower with DEEPSTACK multi-level features.

Reference analog: ``lmdeploy/pytorch/models/qwen3_vl.py``.  Novelties over
qwen2.5-vl, all handled here:

  * learned absolute position embeddings, bilinearly interpolated to each
    image's grid (``fast_pos_embed_interpolate``) — corner indices + weights
    are computed host-side per grid and shipped as arrays, so the jitted
    tower does one gather + weighted sum;
  * full (per-frame) attention in every block — no window masks;
  * non-gated biased MLP with tanh-gelu; LayerNorm blocks;
  * DEEPSTACK: features tapped at ``deepstack_visual_indexes`` run through
    dedicated post-shuffle mergers, and the LM adds slice ``i`` at visual
    positions after decoder layer ``i`` (models/llama.py deepstack hook —
    the span features are widened to ``(1+K)*H``);
  * lane-interleaved mrope (T,H,W,T,H,W... — nn/layers.gather_mrope
    ``interleaved=True``).
"""
from __future__ import annotations

import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..nn.layers import gather_mrope
from .llama import LlamaModel
from .qwen2_vl import Qwen2VLTower, _Qwen2VLMixin, patch_metadata
from .vision import _layer_norm


def pos_embed_corners(grid: Tuple[int, int, int], merge: int, side: int
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Bilinear corner (indices [n, 4], weights [n, 4]) per patch token, in
    the same merge-window raster order as the pixel rows (reference:
    fast_pos_embed_interpolate, vllm-derived)."""
    md = patch_metadata(grid, merge, 0)
    t, h, w = grid
    hp, wp = md['hpos'].astype(np.float64), md['wpos'].astype(np.float64)
    h_idx = hp * ((side - 1) / (h - 1)) if h > 1 else np.zeros_like(hp)
    w_idx = wp * ((side - 1) / (w - 1)) if w > 1 else np.zeros_like(wp)
    hf = np.floor(h_idx).astype(np.int64)
    wf = np.floor(w_idx).astype(np.int64)
    hc = np.minimum(hf + 1, side - 1)
    wc = np.minimum(wf + 1, side - 1)
    dh, dw = h_idx - hf, w_idx - wf
    idx = np.stack([hf * side + wf, hf * side + wc,
                    hc * side + wf, hc * side + wc], axis=-1)
    wt = np.stack([(1 - dh) * (1 - dw), (1 - dh) * dw,
                   dh * (1 - dw), dh * dw], axis=-1)
    return idx.astype(np.int32), wt.astype(np.float32)


class Qwen3VLTower(Qwen2VLTower):
    """Qwen3-VL vision encoder (pos-embed interpolation + deepstack taps)."""

    def __init__(self, vision_config: Dict):
        vc = vision_config
        super().__init__(dict(vc, model_type='qwen2_5_vl'))   # v25-style dims
        self.mlp_dim = vc.get('intermediate_size', self.width * 4)
        self.num_pos = vc.get('num_position_embeddings', 2304)
        self.side = int(self.num_pos ** 0.5)
        self.ds_idx = tuple(vc.get('deepstack_visual_indexes', ()))
        self.window = 0
        self.win_tokens = 0
        self.fullatt = set(range(self.depth))

    def param_shapes(self) -> Dict:
        E, L, M, H = self.width, self.depth, self.mlp_dim, self.out_hidden
        C = E * self.merge * self.merge
        shapes = {
            'patch_embed': (self.feat_dim, E), 'patch_embed_b': (E,),
            'pos_embed': (self.num_pos, E),
            'merge_norm_w': (C // (self.merge ** 2),),
            'merge_norm_b': (C // (self.merge ** 2),),
            'merge_fc1': (C, C), 'merge_fc1_b': (C,),
            'merge_fc2': (C, H), 'merge_fc2_b': (H,),
            'layers': {
                'ln1_w': (L, E), 'ln1_b': (L, E),
                'qkv': (L, E, 3 * E), 'qkv_b': (L, 3 * E),
                'wo': (L, E, E), 'bo': (L, E),
                'ln2_w': (L, E), 'ln2_b': (L, E),
                'fc1': (L, E, M), 'b1': (L, M),
                'fc2': (L, M, E), 'b2': (L, E),
            },
        }
        K = len(self.ds_idx)
        if K:
            shapes['ds'] = {
                'norm_w': (K, C), 'norm_b': (K, C),        # POST-shuffle norm
                'fc1': (K, C, C), 'fc1_b': (K, C),
                'fc2': (K, C, H), 'fc2_b': (K, H),
            }
        return shapes

    def make_assign_plan(self, prefix: str = 'visual.'):
        E = self.width

        def conv_to_mat(x):     # [E, C, tp, P, P] -> [C*tp*P*P, E]
            return np.ascontiguousarray(x.reshape(E, -1).T)

        def T(x):
            return np.ascontiguousarray(np.swapaxes(x, -1, -2))

        ident = lambda x: x  # noqa: E731
        plan = {
            f'{prefix}patch_embed.proj.weight':
                (('patch_embed',), conv_to_mat, None),
            f'{prefix}patch_embed.proj.bias': (('patch_embed_b',), ident,
                                               None),
            f'{prefix}pos_embed.weight': (('pos_embed',), ident, None),
            f'{prefix}merger.norm.weight': (('merge_norm_w',), ident, None),
            f'{prefix}merger.norm.bias': (('merge_norm_b',), ident, None),
            f'{prefix}merger.linear_fc1.weight': (('merge_fc1',), T, None),
            f'{prefix}merger.linear_fc1.bias': (('merge_fc1_b',), ident, None),
            f'{prefix}merger.linear_fc2.weight': (('merge_fc2',), T, None),
            f'{prefix}merger.linear_fc2.bias': (('merge_fc2_b',), ident, None),
        }
        per_layer = [
            ('norm1.weight', 'ln1_w', ident), ('norm1.bias', 'ln1_b', ident),
            ('norm2.weight', 'ln2_w', ident), ('norm2.bias', 'ln2_b', ident),
            ('attn.qkv.weight', 'qkv', T), ('attn.qkv.bias', 'qkv_b', ident),
            ('attn.proj.weight', 'wo', T), ('attn.proj.bias', 'bo', ident),
            ('mlp.linear_fc1.weight', 'fc1', T),
            ('mlp.linear_fc1.bias', 'b1', ident),
            ('mlp.linear_fc2.weight', 'fc2', T),
            ('mlp.linear_fc2.bias', 'b2', ident),
        ]
        for layer in range(self.depth):
            for hf, name, tr in per_layer:
                plan[f'{prefix}blocks.{layer}.{hf}'] = \
                    (('layers', name, layer), tr, None)
        for i in range(len(self.ds_idx)):
            p = f'{prefix}deepstack_merger_list.{i}.'
            plan[p + 'norm.weight'] = (('ds', 'norm_w', i), ident, None)
            plan[p + 'norm.bias'] = (('ds', 'norm_b', i), ident, None)
            plan[p + 'linear_fc1.weight'] = (('ds', 'fc1', i), T, None)
            plan[p + 'linear_fc1.bias'] = (('ds', 'fc1_b', i), ident, None)
            plan[p + 'linear_fc2.weight'] = (('ds', 'fc2', i), T, None)
            plan[p + 'linear_fc2.bias'] = (('ds', 'fc2_b', i), ident, None)
        return plan

    # -- forward -----------------------------------------------------------------------
    def forward(self, params, pixels: jax.Array, hpos: jax.Array,
                wpos: jax.Array, frame: jax.Array, pos_idx: jax.Array,
                pos_wt: jax.Array) -> jax.Array:
        """pixels [n, feat] -> merged features [n/m^2, (1+K)*out_hidden]
        (main features followed by the K deepstack slices)."""
        E, Hh, Dh = self.width, self.heads, self.head_dim
        n = pixels.shape[0]
        m2 = self.merge ** 2
        x = (jnp.dot(pixels, params['patch_embed'],
                     preferred_element_type=jnp.float32)
             + params['patch_embed_b']).astype(pixels.dtype)
        # bilinear learned pos embed (host-computed corners)
        pe = jnp.sum(params['pos_embed'][pos_idx].astype(jnp.float32)
                     * pos_wt[..., None], axis=1)
        x = x + pe.astype(x.dtype)

        inv = jnp.asarray(self.inv_freq)
        ang = jnp.concatenate([hpos[:, None] * inv[None, :],
                               wpos[:, None] * inv[None, :]], axis=-1)
        cos, sin = jnp.cos(ang), jnp.sin(ang)
        mask = frame[:, None] == frame[None, :]
        neg = jnp.asarray(-1e30, jnp.float32)
        scale = 1.0 / math.sqrt(Dh)

        def rot(v):
            d2 = v.shape[-1] // 2
            v1 = v[..., :d2].astype(jnp.float32)
            v2 = v[..., d2:].astype(jnp.float32)
            c, s = cos[:, None, :], sin[:, None, :]
            return jnp.concatenate([v1 * c - v2 * s, v2 * c + v1 * s],
                                   axis=-1).astype(v.dtype)

        def block(x, w):
            h = _layer_norm(x, w['ln1_w'], w['ln1_b'], self.eps)
            qkv = (jnp.dot(h, w['qkv'], preferred_element_type=jnp.float32)
                   + w['qkv_b']).astype(x.dtype)
            q, k, v = [a.reshape(n, Hh, Dh)
                       for a in jnp.split(qkv, 3, axis=-1)]
            q, k = rot(q), rot(k)
            logits = jnp.einsum('qhd,khd->hqk', q.astype(jnp.float32),
                                k.astype(jnp.float32)) * scale
            logits = jnp.where(mask[None], logits, neg)
            p = jax.nn.softmax(logits, axis=-1)
            attn = jnp.einsum('hqk,khd->qhd', p,
                              v.astype(jnp.float32)).reshape(n, E)
            x = x + (jnp.dot(attn.astype(x.dtype), w['wo'],
                             preferred_element_type=jnp.float32)
                     + w['bo']).astype(x.dtype)
            h = _layer_norm(x, w['ln2_w'], w['ln2_b'], self.eps)
            mm = (jnp.dot(h, w['fc1'], preferred_element_type=jnp.float32)
                  + w['b1'])
            mm = jax.nn.gelu(mm, approximate=True).astype(x.dtype)
            out = (jnp.dot(mm, w['fc2'], preferred_element_type=jnp.float32)
                   + w['b2'])
            return x + out.astype(x.dtype)

        # deepstack taps force an unrolled loop (a handful of layers on the
        # host side; each block is one fused attention+MLP graph)
        lp = params['layers']
        ds_feats = []
        for i in range(self.depth):
            w = {k: v[i] for k, v in lp.items()}
            x = block(x, w)
            if i in self.ds_idx:
                j = self.ds_idx.index(i)
                d = params['ds']
                y = x.reshape(n // m2, -1)                    # post-shuffle
                y = _layer_norm(y, d['norm_w'][j], d['norm_b'][j], self.eps)
                y = (jnp.dot(y, d['fc1'][j],
                             preferred_element_type=jnp.float32)
                     + d['fc1_b'][j])
                y = jax.nn.gelu(y, approximate=False).astype(x.dtype)
                y = (jnp.dot(y, d['fc2'][j],
                             preferred_element_type=jnp.float32)
                     + d['fc2_b'][j])
                ds_feats.append(y)

        y = _layer_norm(x, params['merge_norm_w'], params['merge_norm_b'],
                        self.eps)
        y = y.reshape(n // m2, -1)
        y = (jnp.dot(y, params['merge_fc1'],
                     preferred_element_type=jnp.float32)
             + params['merge_fc1_b'])
        y = jax.nn.gelu(y, approximate=False).astype(x.dtype)
        y = (jnp.dot(y, params['merge_fc2'],
                     preferred_element_type=jnp.float32)
             + params['merge_fc2_b'])
        return jnp.concatenate([y] + ds_feats, axis=-1)


class _Qwen3VLMixin(_Qwen2VLMixin):
    """Qwen3-VL surface: deepstack-widened spans + interleaved mrope."""

    def _init_vision(self, config: ModelConfig):
        vis = config.vision or {}
        vc = vis.get('vision_config', {})
        self.tower = Qwen3VLTower(vc)
        self.image_token_index = vis.get('image_token_index')
        self.image_marker = '<|image_pad|>'
        scaling = config.rope_scaling or {}
        self.mrope_section = tuple(scaling.get('mrope_section') or
                                   (config.head_dim // 6,) * 3)
        self.mrope_interleaved = bool(scaling.get('mrope_interleaved', False))
        self.embed_feature_width = (
            (1 + len(self.tower.ds_idx)) * config.hidden_size)
        self._encode_jit = None

    def _gather_rope(self, rope_cos, rope_sin, positions):
        if positions.ndim == 3:
            return gather_mrope(rope_cos, rope_sin, positions,
                                self.mrope_section,
                                interleaved=self.mrope_interleaved)
        return LlamaModel._gather_rope(self, rope_cos, rope_sin, positions)

    def encode_images_raw(self, vis_params, images
                          ) -> Tuple[List[np.ndarray], List[Tuple]]:
        from ..vl.qwen_vl import QwenVLImageProcessor
        proc = QwenVLImageProcessor(patch_size=self.tower.patch_size,
                                    merge_size=self.tower.merge,
                                    temporal_patch=self.tower.temporal_patch)
        if self._encode_jit is None:
            self._encode_jit = jax.jit(self.tower.forward)
        feats, grids = [], []
        for img in images:
            pixels, grid = proc(img)
            md = patch_metadata(grid, self.tower.merge, 0)
            pos_idx, pos_wt = pos_embed_corners(grid, self.tower.merge,
                                                self.tower.side)
            out = self._encode_jit(vis_params, jnp.asarray(pixels),
                                   jnp.asarray(md['hpos']),
                                   jnp.asarray(md['wpos']),
                                   jnp.asarray(md['frame']),
                                   jnp.asarray(pos_idx),
                                   jnp.asarray(pos_wt))
            feats.append(np.asarray(out, np.float32))
            grids.append(grid)
        return feats, grids


def build_qwen3_vl(config: ModelConfig):
    config.qk_norm = True
    cls = type('Qwen3VLModel', (_Qwen3VLMixin, LlamaModel), {})
    model = cls(config)
    model._init_vision(config)
    return model


def build_qwen3_vl_moe(config: ModelConfig):
    from .mixtral import MixtralModel
    config.qk_norm = True
    cls = type('Qwen3VLMoeModel', (_Qwen3VLMixin, MixtralModel), {})
    model = cls(config)
    model._init_vision(config)
    return model
