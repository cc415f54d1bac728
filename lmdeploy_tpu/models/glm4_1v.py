"""GLM-4.1V / GLM-4.5V: GLM-4 language model + native-resolution ViT tower.

Reference analog: ``lmdeploy/pytorch/models/glm4_1v.py`` (tower ``:93-489``,
mrope text model ``:26-90``); transformers ``Glm4vForConditionalGeneration``
is the golden reference.

Structure:
  * text: the GLM-4 block (sandwich norms, fused gate_up, interleaved partial
    rope) with qwen2-vl-style SECTIONED mrope — GLM keeps contiguous
    (t, h, w) sections over the half-table, then applies the rotation in
    GLM's interleaved-pair convention, so ``gather_mrope`` composes the
    tables and ``Glm4Model._apply_rope`` does the rest;
  * vision: qwen2-vl-style patchified ViT (one matmul patch embed, 2D rope
    over h/w coordinates, per-frame full attention) with GLM twists —
    RMSNorm blocks with a SwiGLU MLP whose intermediate is out_hidden_size,
    a learned position embedding BICUBICALLY resampled to each image grid
    (host-side torch grid_sample per geometry, shipped as an array), a
    post-norm + strided-conv spatial downsample, and a
    proj/LayerNorm/GELU/SwiGLU patch merger.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..nn.layers import gather_mrope, rms_norm
from .glm4 import Glm4Model
from .qwen2_vl import mrope_positions, patch_metadata
from .vision import _layer_norm


def adapted_pos_embed(pos_weight: np.ndarray, grid: Tuple[int, int, int],
                      hpos: np.ndarray, wpos: np.ndarray) -> np.ndarray:
    """Bicubically resample the learned [side*side, E] position table to one
    image grid (HF ``Glm4vVisionEmbeddings.forward``: grid_sample bicubic,
    align_corners=False, border padding).  Host-side per geometry — a few
    thousand samples from a tiny table, so torch CPU is the exact and cheap
    path."""
    import torch
    import torch.nn.functional as F
    side = int(pos_weight.shape[0] ** 0.5)
    E = pos_weight.shape[1]
    t, h, w = grid
    p2d = torch.from_numpy(np.ascontiguousarray(pos_weight, np.float32))
    p2d = p2d.view(side, side, E).permute(2, 0, 1).unsqueeze(0)
    norm_w = ((torch.from_numpy(wpos.astype(np.float32)) + 0.5) / w) * 2 - 1
    norm_h = ((torch.from_numpy(hpos.astype(np.float32)) + 0.5) / h) * 2 - 1
    grid_pts = torch.stack((norm_w, norm_h), dim=-1)[None, :, None, :]
    out = F.grid_sample(p2d, grid_pts, mode='bicubic', align_corners=False,
                        padding_mode='border')
    return np.ascontiguousarray(out[0, :, :, 0].permute(1, 0).numpy())


class Glm4vTower:
    """Functional GLM-4.1V vision encoder over pre-unfolded patches."""

    def __init__(self, vision_config: Dict):
        vc = vision_config
        self.depth = vc.get('depth', 24)
        self.width = vc.get('hidden_size', 1536)
        self.heads = vc.get('num_heads', 12)
        self.patch_size = vc.get('patch_size', 14)
        self.merge = vc.get('spatial_merge_size', 2)
        self.temporal_patch = vc.get('temporal_patch_size', 2)
        self.channels = vc.get('in_channels', 3)
        self.out_hidden = vc.get('out_hidden_size', 4096)
        self.mlp_dim = self.out_hidden          # block MLP intermediate (!)
        self.merger_dim = vc.get('intermediate_size', 13696)
        self.image_size = vc.get('image_size', 336)
        self.num_pos = (self.image_size // self.patch_size) ** 2
        self.attn_bias = bool(vc.get('attention_bias', False))
        self.eps = vc.get('rms_norm_eps', 1e-5)
        self.head_dim = self.width // self.heads
        self.feat_dim = self.channels * self.temporal_patch * self.patch_size ** 2
        d4 = self.head_dim // 4
        self.inv_freq = (1.0 / 10000.0 ** (np.arange(d4, dtype=np.float32)
                                           * 2 / (self.head_dim // 2)))

    def param_shapes(self) -> Dict:
        E, L, M, H, C = (self.width, self.depth, self.mlp_dim,
                         self.out_hidden, self.merger_dim)
        layers = {
            'ln1': (L, E), 'ln2': (L, E),
            'qkv': (L, E, 3 * E), 'wo': (L, E, E),
            'w_gate': (L, E, M), 'w_up': (L, E, M), 'w_down': (L, M, E),
        }
        if self.attn_bias:
            layers['qkv_b'] = (L, 3 * E)
        m2 = self.merge ** 2
        return {
            'patch_embed': (self.feat_dim, E), 'patch_embed_b': (E,),
            'post_conv_norm': (E,),
            'pos_embed': (self.num_pos, E),
            'post_norm': (E,),
            'downsample': (m2 * E, H), 'downsample_b': (H,),
            'm_proj': (H, H),
            'm_norm_w': (H,), 'm_norm_b': (H,),
            'm_gate': (H, C), 'm_up': (H, C), 'm_down': (C, H),
            'layers': layers,
        }

    def init_params(self, dtype=jnp.float32):
        rng = np.random.default_rng(13)

        def make(name, shape):
            if 'norm' in name and name.endswith('_b'):
                return jnp.zeros(shape, dtype)
            if 'norm' in name or name in ('post_conv_norm', 'post_norm',
                                          'ln1', 'ln2'):
                return jnp.ones(shape, dtype)
            if name.endswith('_b'):
                return jnp.zeros(shape, dtype)
            return jnp.asarray(rng.normal(0, 0.02, shape), dtype)

        def walk(tree):
            return {k: walk(v) if isinstance(v, dict) else make(k, v)
                    for k, v in tree.items()}

        return walk(self.param_shapes())

    def make_assign_plan(self, prefix: str = 'visual.'):
        E, m = self.width, self.merge

        def conv_to_mat(x):     # [E, C, tp, P, P] -> [C*tp*P*P, E]
            return np.ascontiguousarray(x.reshape(E, -1).T)

        def down_to_mat(x):     # [H, E, m, m] -> [m*m*E, H] ([mh, mw, E] rows)
            return np.ascontiguousarray(
                x.transpose(2, 3, 1, 0).reshape(m * m * E, -1))

        def T(x):
            return np.ascontiguousarray(np.swapaxes(x, -1, -2))

        ident = lambda x: x  # noqa: E731
        plan = {
            f'{prefix}patch_embed.proj.weight': (('patch_embed',),
                                                 conv_to_mat, None),
            f'{prefix}patch_embed.proj.bias': (('patch_embed_b',), ident,
                                               None),
            f'{prefix}post_conv_layernorm.weight': (('post_conv_norm',),
                                                    ident, None),
            f'{prefix}embeddings.position_embedding.weight':
                (('pos_embed',), ident, None),
            f'{prefix}post_layernorm.weight': (('post_norm',), ident, None),
            f'{prefix}downsample.weight': (('downsample',), down_to_mat,
                                           None),
            f'{prefix}downsample.bias': (('downsample_b',), ident, None),
            f'{prefix}merger.proj.weight': (('m_proj',), T, None),
            f'{prefix}merger.post_projection_norm.weight':
                (('m_norm_w',), ident, None),
            f'{prefix}merger.post_projection_norm.bias':
                (('m_norm_b',), ident, None),
            f'{prefix}merger.gate_proj.weight': (('m_gate',), T, None),
            f'{prefix}merger.up_proj.weight': (('m_up',), T, None),
            f'{prefix}merger.down_proj.weight': (('m_down',), T, None),
        }
        per_layer = [
            ('norm1.weight', 'ln1', ident), ('norm2.weight', 'ln2', ident),
            ('attn.qkv.weight', 'qkv', T), ('attn.proj.weight', 'wo', T),
            ('mlp.gate_proj.weight', 'w_gate', T),
            ('mlp.up_proj.weight', 'w_up', T),
            ('mlp.down_proj.weight', 'w_down', T),
        ]
        if self.attn_bias:
            per_layer.append(('attn.qkv.bias', 'qkv_b', ident))
        for layer in range(self.depth):
            for hf, name, tr in per_layer:
                plan[f'{prefix}blocks.{layer}.{hf}'] = \
                    (('layers', name, layer), tr, None)
        return plan

    def forward(self, params, pixels: jax.Array, pos_adapt: jax.Array,
                hpos: jax.Array, wpos: jax.Array,
                frame: jax.Array) -> jax.Array:
        """pixels [n, feat] + resampled pos embed [n, E] -> [n/m^2, out]."""
        import math
        E, Hh, Dh = self.width, self.heads, self.head_dim
        n = pixels.shape[0]
        x = (jnp.dot(pixels, params['patch_embed'],
                     preferred_element_type=jnp.float32)
             + params['patch_embed_b']).astype(pixels.dtype)
        x = rms_norm(x, params['post_conv_norm'], self.eps)
        x = x + pos_adapt.astype(x.dtype)

        inv = jnp.asarray(self.inv_freq)
        ang = jnp.concatenate([hpos[:, None] * inv[None, :],
                               wpos[:, None] * inv[None, :]], axis=-1)
        cos, sin = jnp.cos(ang), jnp.sin(ang)          # [n, Dh/2]
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

        def layer_fn(x, w):
            h = rms_norm(x, w['ln1'], self.eps)
            qkv = jnp.dot(h, w['qkv'], preferred_element_type=jnp.float32)
            if self.attn_bias:
                qkv = qkv + w['qkv_b']
            qkv = qkv.astype(x.dtype)
            q, k, v = [a.reshape(n, Hh, Dh)
                       for a in jnp.split(qkv, 3, axis=-1)]
            q, k = rot(q), rot(k)
            logits = jnp.einsum('qhd,khd->hqk', q.astype(jnp.float32),
                                k.astype(jnp.float32)) * scale
            logits = jnp.where(mask[None], logits, neg)
            p = jax.nn.softmax(logits, axis=-1)
            attn = jnp.einsum('hqk,khd->qhd', p, v.astype(jnp.float32))
            attn = attn.reshape(n, E).astype(x.dtype)
            x = x + jnp.dot(attn, w['wo'],
                            preferred_element_type=jnp.float32).astype(x.dtype)
            h = rms_norm(x, w['ln2'], self.eps)
            g = jnp.dot(h, w['w_gate'], preferred_element_type=jnp.float32)
            u = jnp.dot(h, w['w_up'], preferred_element_type=jnp.float32)
            mlp = (jax.nn.silu(g) * u).astype(x.dtype)
            out = jnp.dot(mlp, w['w_down'],
                          preferred_element_type=jnp.float32)
            return x + out.astype(x.dtype), None

        x, _ = jax.lax.scan(layer_fn, x, params['layers'])

        # post-norm + strided-conv spatial downsample over each merge window
        x = rms_norm(x, params['post_norm'], self.eps)
        x = x.reshape(n // (self.merge ** 2), -1)       # [win, m*m*E]
        x = (jnp.dot(x, params['downsample'],
                     preferred_element_type=jnp.float32)
             + params['downsample_b']).astype(pixels.dtype)

        # merger: proj -> LayerNorm -> GELU -> SwiGLU
        x = jnp.dot(x, params['m_proj'], preferred_element_type=jnp.float32)
        x = _layer_norm(x, params['m_norm_w'], params['m_norm_b'], 1e-5)
        x = jax.nn.gelu(x, approximate=False).astype(pixels.dtype)
        g = jnp.dot(x, params['m_gate'], preferred_element_type=jnp.float32)
        u = jnp.dot(x, params['m_up'], preferred_element_type=jnp.float32)
        x = (jax.nn.silu(g) * u).astype(pixels.dtype)
        return jnp.dot(x, params['m_down'],
                       preferred_element_type=jnp.float32).astype(pixels.dtype)


class _Glm4vMixin:
    """VLM surface over the GLM-4 LM base."""

    uses_mrope = True

    def _init_vision(self, config: ModelConfig):
        vis = config.vision or {}
        self.tower = Glm4vTower(vis.get('vision_config', {}))
        self.image_token_index = vis.get('image_token_index')
        self.image_marker = '<|image|>'
        scaling = config.rope_scaling or {}
        self.mrope_section = tuple(scaling.get('mrope_section') or
                                   (config.rope_dim // 6,) * 3)
        self._encode_jit = None

    def _gather_rope(self, rope_cos, rope_sin, positions):
        if positions.ndim == 3:       # [B, T, 3] multimodal prefill positions
            return gather_mrope(rope_cos, rope_sin, positions,
                                self.mrope_section)
        return super()._gather_rope(rope_cos, rope_sin, positions)

    def vis_param_shapes(self) -> Dict:
        return self.tower.param_shapes()

    def init_vis_params(self, dtype=jnp.float32):
        return self.tower.init_params(dtype=dtype)

    def vis_assign_plan(self):
        plan = self.tower.make_assign_plan('visual.')
        plan.update({'model.' + k: v for k, v in list(plan.items())})
        return plan

    def encode_images_raw(self, vis_params, images) -> Tuple[List[np.ndarray],
                                                             List[Tuple]]:
        from ..vl.qwen_vl import QwenVLImageProcessor
        proc = QwenVLImageProcessor(patch_size=self.tower.patch_size,
                                    merge_size=self.tower.merge,
                                    temporal_patch=self.tower.temporal_patch)
        if self._encode_jit is None:
            self._encode_jit = jax.jit(self.tower.forward)
        feats, grids = [], []
        pos_weight = None
        for img in images:
            pixels, grid = proc(img)
            md = patch_metadata(grid, self.tower.merge, 0)
            if pos_weight is None:
                pos_weight = np.asarray(vis_params['pos_embed'], np.float32)
            pe = adapted_pos_embed(pos_weight, grid, md['hpos'], md['wpos'])
            out = self._encode_jit(vis_params, jnp.asarray(pixels),
                                   jnp.asarray(pe), jnp.asarray(md['hpos']),
                                   jnp.asarray(md['wpos']),
                                   jnp.asarray(md['frame']))
            feats.append(np.asarray(out, np.float32))
            grids.append(grid)
        return feats, grids

    def build_mrope(self, token_ids, grids, start: int = 0):
        # image mrope semantics equal qwen2-vl's (HF Glm4vModel.get_rope_index)
        return mrope_positions(token_ids, self.image_token_index, grids,
                               merge=self.tower.merge, start=start)

    def make_assign_plan(self):
        # transformers nests the LM under model.language_model.
        base = super().make_assign_plan()
        plan = dict(base)
        for k, v in base.items():
            if k.startswith('model.'):
                plan['model.language_model.' + k[len('model.'):]] = v
        return plan


def build_glm4_1v(config: ModelConfig):
    cls = type('Glm4vModel', (_Glm4vMixin, Glm4Model), {})
    config.attention_bias = True     # q/k/v biases (Glm4vTextAttention)
    model = cls(config)
    model._init_vision(config)
    return model
