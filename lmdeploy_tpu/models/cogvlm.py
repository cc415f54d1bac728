"""CogVLM / CogVLM2: dual vision/language experts + EVA2-CLIP tower.

Reference analog: ``lmdeploy/pytorch/models/cogvlm.py`` (919 LoC).  Every
decoder layer carries TWO sets of attention projections and MLPs —
``vision_expert_*`` applied at image-token positions, ``language_expert_*``
elsewhere (VisionExpertAttention / VisionExpertMLP).  TPU-first: instead of
the reference's scatter into per-id slices, both experts run as dense GEMMs
and a per-position ``jnp.where`` selects — decode steps carry no vision
positions and skip the vision GEMMs entirely (the mask is None), so the 2x
FLOPs only touch multimodal prefill chunks.

The vision side is the EVA2-CLIP encoder (conv patch embed + CLS + learned
positions; post-norm transformer layers ``x + ln(attn(x))``), the cogvlm2
2x2 conv downsample when ``num_positions != 1226``, the GLU adapter
(``silu(gate) * h`` after a GELU'd layernorm bottleneck), and learned
boi/eoi tokens wrapping the image sequence.

Positions are standard rope positions (the reference ships with the shared
vision-block position scheme disabled — cogvlm.py:709).
"""
from __future__ import annotations

import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from .llama import LlamaModel


class CogVLMModel(LlamaModel):
    """CogVLMForCausalLM."""

    image_marker = '<img>'

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.hf_config or {}
        self.is_cogvlm2 = 'num_multi_query_heads' in hf
        self._vis_mask = None

    # -- dual-expert params ------------------------------------------------------------
    def param_shapes(self):
        shapes = super().param_shapes()
        L, H, I = (self.config.num_layers, self.config.hidden_size,
                   self.config.intermediate_size)
        lp = shapes['layers']
        lp.update({
            'vis_wq': (L, H, self.q_out),
            'vis_wk': (L, H, self.kv_out),
            'vis_wv': (L, H, self.kv_out),
            'vis_wo': (L, self.q_out, H),
            'vis_gate': (L, H, I), 'vis_up': (L, H, I), 'vis_down': (L, I, H),
        })
        if self.is_cogvlm2:
            lp.update({'vis_bq': (L, self.q_out), 'vis_bk': (L, self.kv_out),
                       'vis_bv': (L, self.kv_out)})
        return shapes

    def make_assign_plan(self):
        plan = super().make_assign_plan()
        qo, ko = self.q_out, self.kv_out

        def T(x):
            return np.ascontiguousarray(np.swapaxes(np.asarray(x), -1, -2))

        def part(lo, hi, transform=T):
            def f(x):
                return transform(np.asarray(x)[lo:hi])
            return f

        ident_part = lambda lo, hi: (lambda x: np.asarray(x)[lo:hi])  # noqa: E731
        for l in range(self.config.num_layers):
            p = f'model.layers.{l}.'
            a = p + 'self_attn.'
            plan[a + 'vision_expert_query_key_value.weight'] = [
                (('layers', 'vis_wq', l), part(0, qo), None),
                (('layers', 'vis_wk', l), part(qo, qo + ko), None),
                (('layers', 'vis_wv', l), part(qo + ko, qo + 2 * ko), None),
            ]
            plan[a + 'language_expert_query_key_value.weight'] = [
                (('layers', 'wq', l), part(0, qo), None),
                (('layers', 'wk', l), part(qo, qo + ko), None),
                (('layers', 'wv', l), part(qo + ko, qo + 2 * ko), None),
            ]
            if self.is_cogvlm2:
                plan[a + 'vision_expert_query_key_value.bias'] = [
                    (('layers', 'vis_bq', l), ident_part(0, qo), None),
                    (('layers', 'vis_bk', l), ident_part(qo, qo + ko), None),
                    (('layers', 'vis_bv', l),
                     ident_part(qo + ko, qo + 2 * ko), None),
                ]
            plan[a + 'vision_expert_dense.weight'] = \
                (('layers', 'vis_wo', l), T, None)
            plan[a + 'language_expert_dense.weight'] = \
                (('layers', 'wo', l), T, None)
            m = p + 'mlp.'
            for hf_n, ours in (('gate_proj', 'w_gate'), ('up_proj', 'w_up'),
                               ('down_proj', 'w_down')):
                plan[m + f'language_mlp.{hf_n}.weight'] = \
                    (('layers', ours, l), T, None)
            for hf_n, ours in (('gate_proj', 'vis_gate'), ('up_proj', 'vis_up'),
                               ('down_proj', 'vis_down')):
                plan[m + f'vision_mlp.{hf_n}.weight'] = \
                    (('layers', ours, l), T, None)
        return plan

    # -- forward hooks -----------------------------------------------------------------
    def forward(self, params, input_ids, positions, kv_cache, meta, rope_cos,
                rope_sin, *args, embeds_mask=None, **kwargs):
        # image-feature positions select the vision expert in every layer
        self._vis_mask = embeds_mask
        try:
            return super().forward(params, input_ids, positions, kv_cache,
                                   meta, rope_cos, rope_sin, *args,
                                   embeds_mask=embeds_mask, **kwargs)
        finally:
            self._vis_mask = None

    def _dual(self, w, x, lang_key, vis_key, lang_bias=None, vis_bias=None):
        y = jnp.dot(x, w[lang_key], preferred_element_type=jnp.float32)
        if lang_bias is not None:
            y = y + lang_bias.astype(jnp.float32)
        if self._vis_mask is None:
            return y.astype(x.dtype)
        yv = jnp.dot(x, w[vis_key], preferred_element_type=jnp.float32)
        if vis_bias is not None:
            yv = yv + vis_bias.astype(jnp.float32)
        return jnp.where(self._vis_mask[..., None], yv, y).astype(x.dtype)

    def _qkv_proj(self, w, lw, x, lin, has_bias):
        q = self._dual(w, x, 'wq', 'vis_wq', vis_bias=w.get('vis_bq'))
        k = self._dual(w, x, 'wk', 'vis_wk', vis_bias=w.get('vis_bk'))
        v = self._dual(w, x, 'wv', 'vis_wv', vis_bias=w.get('vis_bv'))
        return q, k, v

    def _o_proj(self, w, lw, attn, lin):
        return self._dual(w, attn, 'wo', 'vis_wo')

    def _mlp(self, w, x):
        def one(gk, uk, dk):
            act = jax.nn.silu(jnp.dot(x, w[gk],
                                      preferred_element_type=jnp.float32))
            act = act * jnp.dot(x, w[uk], preferred_element_type=jnp.float32)
            return jnp.dot(act.astype(x.dtype), w[dk],
                           preferred_element_type=jnp.float32)

        y = one('w_gate', 'w_up', 'w_down')
        if self._vis_mask is None:
            return y.astype(x.dtype)
        yv = one('vis_gate', 'vis_up', 'vis_down')
        return jnp.where(self._vis_mask[..., None], yv, y).astype(x.dtype)

    # -- vision (EVA2-CLIP + GLU) ------------------------------------------------------
    def _init_vision(self, config: ModelConfig):
        vis = config.vision or {}
        hf = config.hf_config or {}
        vc = dict(vis.get('vision_config') or hf.get('vision_config') or {})
        self.v_width = vc.get('hidden_size', 1792)
        self.v_layers = vc.get('num_hidden_layers', 63)
        self.v_heads = vc.get('num_heads', 16)
        self.v_mlp = vc.get('intermediate_size', 15360)
        self.v_patch = vc.get('patch_size', 14)
        self.v_image = vc.get('image_size', 490)
        self.v_eps = vc.get('layer_norm_eps', 1e-6)
        self.v_positions = vc.get('num_positions',
                                  (self.v_image // self.v_patch) ** 2 + 1)
        self.has_conv = self.v_positions != 1226          # cogvlm2 downsample
        self.adapter_inter = hf.get('intermediate_size',
                                    self.config.intermediate_size)
        self.image_mean = tuple(vc.get('image_mean',
                                       (0.48145466, 0.4578275, 0.40821073)))
        self.image_std = tuple(vc.get('image_std',
                                      (0.26862954, 0.26130258, 0.27577711)))
        self.image_token_index = hf.get('image_token_id')
        self._encode_jit = None

    def vis_param_shapes(self) -> Dict:
        W, Ln, H = self.v_width, self.v_layers, self.config.hidden_size
        P = self.v_patch
        shapes = {
            'patch_w': (P * P * 3, W), 'patch_b': (W,),
            'cls': (W,), 'pos': (self.v_positions, W),
            'layers': {
                'ln1_w': (Ln, W), 'ln1_b': (Ln, W),
                'qkv_w': (Ln, W, 3 * W), 'qkv_b': (Ln, 3 * W),
                'dense_w': (Ln, W, W), 'dense_b': (Ln, W),
                'ln2_w': (Ln, W), 'ln2_b': (Ln, W),
                'fc1_w': (Ln, W, self.v_mlp), 'fc1_b': (Ln, self.v_mlp),
                'fc2_w': (Ln, self.v_mlp, W), 'fc2_b': (Ln, W),
            },
            'proj_w': (W, H),
            'adapter_ln_w': (H,), 'adapter_ln_b': (H,),
            'h4h_w': (H, self.adapter_inter),
            'gate_w': (H, self.adapter_inter),
            'h4_out_w': (self.adapter_inter, H),
            'boi': (H,), 'eoi': (H,),
        }
        if self.has_conv:
            shapes['conv_w'] = (W, W, 2, 2)
            shapes['conv_b'] = (W,)
        return shapes

    def init_vis_params(self, dtype=jnp.float32):
        rng = np.random.RandomState(0)

        def walk(tree):
            return {k: walk(v) if isinstance(v, dict) else jnp.asarray(
                rng.randn(*v).astype(np.float32) * 0.02, dtype)
                for k, v in tree.items()}

        return walk(self.vis_param_shapes())

    def vis_assign_plan(self):
        b = 'model.vision.'
        P, W = self.v_patch, self.v_width
        ident = lambda x: np.asarray(x)  # noqa: E731

        def T(x):
            return np.ascontiguousarray(np.swapaxes(np.asarray(x), -1, -2))

        def conv_to_mat(x):
            return np.ascontiguousarray(np.transpose(
                np.asarray(x), (2, 3, 1, 0)).reshape(P * P * 3, W))

        plan = {
            b + 'patch_embedding.proj.weight': (('patch_w',), conv_to_mat, None),
            b + 'patch_embedding.proj.bias': (('patch_b',), ident, None),
            b + 'patch_embedding.cls_embedding':
                (('cls',), lambda x: np.asarray(x).reshape(-1), None),
            b + 'patch_embedding.position_embedding.weight':
                (('pos',), ident, None),
            b + 'linear_proj.linear_proj.weight': (('proj_w',), T, None),
            b + 'linear_proj.norm1.weight': (('adapter_ln_w',), ident, None),
            b + 'linear_proj.norm1.bias': (('adapter_ln_b',), ident, None),
            b + 'linear_proj.dense_h_to_4h.weight': (('h4h_w',), T, None),
            b + 'linear_proj.gate_proj.weight': (('gate_w',), T, None),
            b + 'linear_proj.dense_4h_to_h.weight': (('h4_out_w',), T, None),
            b + 'boi': (('boi',), lambda x: np.asarray(x).reshape(-1), None),
            b + 'eoi': (('eoi',), lambda x: np.asarray(x).reshape(-1), None),
        }
        if self.has_conv:
            plan[b + 'conv.weight'] = (('conv_w',), ident, None)
            plan[b + 'conv.bias'] = (('conv_b',), ident, None)
        for li in range(self.v_layers):
            lb = b + f'transformer.layers.{li}.'
            plan[lb + 'input_layernorm.weight'] = \
                (('layers', 'ln1_w', li), ident, None)
            plan[lb + 'input_layernorm.bias'] = \
                (('layers', 'ln1_b', li), ident, None)
            plan[lb + 'post_attention_layernorm.weight'] = \
                (('layers', 'ln2_w', li), ident, None)
            plan[lb + 'post_attention_layernorm.bias'] = \
                (('layers', 'ln2_b', li), ident, None)
            plan[lb + 'attention.query_key_value.weight'] = \
                (('layers', 'qkv_w', li), T, None)
            plan[lb + 'attention.query_key_value.bias'] = \
                (('layers', 'qkv_b', li), ident, None)
            plan[lb + 'attention.dense.weight'] = \
                (('layers', 'dense_w', li), T, None)
            plan[lb + 'attention.dense.bias'] = \
                (('layers', 'dense_b', li), ident, None)
            plan[lb + 'mlp.fc1.weight'] = (('layers', 'fc1_w', li), T, None)
            plan[lb + 'mlp.fc1.bias'] = (('layers', 'fc1_b', li), ident, None)
            plan[lb + 'mlp.fc2.weight'] = (('layers', 'fc2_w', li), T, None)
            plan[lb + 'mlp.fc2.bias'] = (('layers', 'fc2_b', li), ident, None)
        return plan

    def _ln(self, x, w, b, eps=None):
        eps = self.v_eps if eps is None else eps
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + eps) * w + b

    def _tower_forward(self, p, pixels: jax.Array) -> jax.Array:
        """[N, S, S, 3] -> [N, 2 + tokens, H] (boi/eoi included)."""
        N = pixels.shape[0]
        P = self.v_patch
        G = self.v_image // P
        W = self.v_width
        x = pixels.reshape(N, G, P, G, P, 3).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(N, G * G, P * P * 3) @ p['patch_w'] + p['patch_b']
        cls = jnp.broadcast_to(p['cls'], (N, 1, W))
        x = jnp.concatenate([cls, x], axis=1) + p['pos'][None]
        heads = self.v_heads
        hd = W // heads
        S = x.shape[1]

        def attn(y, w, li):
            qkv = y @ w['qkv_w'][li] + w['qkv_b'][li]
            q, k, v = jnp.split(qkv, 3, axis=-1)

            def sp(t):
                return t.reshape(N, S, heads, hd).transpose(0, 2, 1, 3)

            a = jnp.einsum('nhqd,nhkd->nhqk', sp(q), sp(k)) / math.sqrt(hd)
            a = jax.nn.softmax(a.astype(jnp.float32), -1).astype(y.dtype)
            o = jnp.einsum('nhqk,nhkd->nhqd', a, sp(v))
            o = o.transpose(0, 2, 1, 3).reshape(N, S, W)
            return o @ w['dense_w'][li] + w['dense_b'][li]

        lw = p['layers']
        for li in range(self.v_layers):
            # post-norm EVA2CLIP residual: x + ln(attn(x)), x + ln(mlp(x))
            x = x + self._ln(attn(x, lw, li), lw['ln1_w'][li], lw['ln1_b'][li])
            y = jax.nn.gelu(x @ lw['fc1_w'][li] + lw['fc1_b'][li],
                            approximate=False)
            y = y @ lw['fc2_w'][li] + lw['fc2_b'][li]
            x = x + self._ln(y, lw['ln2_w'][li], lw['ln2_b'][li])
        x = x[:, 1:]                                       # drop CLS
        if self.has_conv:
            g = int(round(math.sqrt(x.shape[1])))
            xi = x.reshape(N, g, g, W).transpose(0, 3, 1, 2)
            xi = jax.lax.conv_general_dilated(
                xi, p['conv_w'], (2, 2), 'VALID',
                dimension_numbers=('NCHW', 'OIHW', 'NCHW'))
            x = (xi + p['conv_b'][None, :, None, None]).reshape(
                N, W, -1).transpose(0, 2, 1)
        # GLU adapter
        x = x @ p['proj_w']
        x = jax.nn.gelu(self._ln(x, p['adapter_ln_w'], p['adapter_ln_b'],
                                 eps=1e-5), approximate=False)
        x = jax.nn.silu(x @ p['gate_w']) * (x @ p['h4h_w'])
        x = x @ p['h4_out_w']
        H = x.shape[-1]
        boi = jnp.broadcast_to(p['boi'], (N, 1, H))
        eoi = jnp.broadcast_to(p['eoi'], (N, 1, H))
        return jnp.concatenate([boi, x, eoi], axis=1)

    def encode_images_raw(self, vis_params, images
                          ) -> Tuple[List[np.ndarray], List[Tuple]]:
        from ..vl.processor import load_image
        if self._encode_jit is None:
            self._encode_jit = jax.jit(self._tower_forward)
        feats, grids = [], []
        for img in images:
            im = load_image(img).convert('RGB').resize(
                (self.v_image, self.v_image))
            x = np.asarray(im, np.float32) / 255.0
            x = (x - np.asarray(self.image_mean)) / np.asarray(self.image_std)
            out = self._encode_jit(vis_params, jnp.asarray(x[None],
                                                           jnp.float32))
            feats.append(np.asarray(out[0], np.float32))
            grids.append((1, 1, 1))
        return feats, grids


def build_cogvlm(config: ModelConfig):
    hf = config.hf_config or {}
    if 'num_multi_query_heads' in hf:
        config.num_key_value_heads = hf['num_multi_query_heads']
    model = CogVLMModel(config)
    model._init_vision(config)
    return model
