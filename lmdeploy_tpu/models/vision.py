"""CLIP-style vision tower for VLM models (llava family).

Reference analog: ``lmdeploy/vl/model/llava_hf.py`` + the HF CLIPVisionModel it
wraps.  TPU-first design choices:

- patchify is ONE matmul: ``[N, nP, P*P*3] @ [P*P*3, W]`` — identical to the
  reference's Conv2d(stride=P) but lands directly on the MXU with no conv
  lowering;
- the encoder rides a single ``lax.scan`` over stacked layer params (same
  pattern as the language models), full bidirectional attention, static
  ``(S, W)`` shapes — one compile per image geometry;
- feature selection (``vision_feature_layer``, typically -2) is done by simply
  scanning fewer layers: HF's hidden_states[-2] is the output after skipping
  the final encoder layer, so we stack only the layers that actually run.

Weights map from HF ``CLIPVisionModel`` (vision_model.*) checkpoints.
"""
from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


_ACTS = {'quick_gelu': quick_gelu,
         # transformers ACT2FN['gelu'] is the exact erf form; the tanh
         # approximation is its own name
         'gelu': lambda x: jax.nn.gelu(x, approximate=False),
         'gelu_pytorch_tanh': lambda x: jax.nn.gelu(x, approximate=True)}


class ClipVisionTower:
    """Functional CLIP ViT encoder: pixel values [N, S, S, 3] -> [N, T, W]."""

    def __init__(self, vision_config: Dict, feature_layer: int = -2,
                 select_strategy: str = 'default'):
        vc = vision_config
        self.image_size = vc.get('image_size', 336)
        self.patch_size = vc.get('patch_size', 14)
        self.width = vc.get('hidden_size', 1024)
        self.heads = vc.get('num_attention_heads', 16)
        self.mlp_dim = vc.get('intermediate_size', 4096)
        self.total_layers = vc.get('num_hidden_layers', 24)
        self.eps = vc.get('layer_norm_eps', 1e-5)
        self.act = _ACTS[vc.get('hidden_act', 'quick_gelu')]
        # hidden_states[feature_layer]: index 0 = embeddings, i = after layer i.
        self.num_layers = (self.total_layers + 1 + feature_layer
                           if feature_layer < 0 else feature_layer)
        self.select_strategy = select_strategy
        self.grid = self.image_size // self.patch_size
        self.num_patches = self.grid * self.grid
        # tokens the language model sees per image
        self.num_image_tokens = (self.num_patches if select_strategy == 'default'
                                 else self.num_patches + 1)

    # -- params ------------------------------------------------------------------------
    def param_shapes(self) -> Dict:
        P, W, L = self.patch_size, self.width, self.num_layers
        layers = {
            'ln1_w': (L, W), 'ln1_b': (L, W),
            'wq': (L, W, W), 'bq': (L, W),
            'wk': (L, W, W), 'bk': (L, W),
            'wv': (L, W, W), 'bv': (L, W),
            'wo': (L, W, W), 'bo': (L, W),
            'ln2_w': (L, W), 'ln2_b': (L, W),
            'fc1': (L, W, self.mlp_dim), 'b1': (L, self.mlp_dim),
            'fc2': (L, self.mlp_dim, W), 'b2': (L, W),
        }
        return {
            'patch_embed': (P * P * 3, W),
            'class_embed': (W,),
            'pos_embed': (self.num_patches + 1, W),
            'pre_ln_w': (W,), 'pre_ln_b': (W,),
            'layers': layers,
        }

    def init_params(self, rng=None, scale: float = 0.02, dtype=jnp.float32):
        rng = np.random.default_rng(0)

        def make(path, shape):
            name = path[-1]
            if name.startswith(('ln', 'pre_ln')) and name.endswith('_w'):
                return jnp.ones(shape, dtype)
            if name.endswith(('_b', 'b1', 'b2')) or name in ('bq', 'bk', 'bv',
                                                             'bo'):
                return jnp.zeros(shape, dtype)
            return jnp.asarray(rng.normal(0, scale, shape), dtype)

        def walk(tree, path):
            return {k: walk(v, path + (k,)) if isinstance(v, dict)
                    else make(path + (k,), v) for k, v in tree.items()}

        return walk(self.param_shapes(), ())

    # -- HF weight mapping -------------------------------------------------------------
    def make_assign_plan(self, prefix: str = 'vision_tower.vision_model.'):
        """{hf_name: (path, transform, None)} for the loader (same contract as LMs)."""
        P, W = self.patch_size, self.width

        def conv_to_mat(x):  # [W, 3, P, P] -> [P*P*3, W] matching patch unfold
            return np.ascontiguousarray(
                np.transpose(x, (2, 3, 1, 0)).reshape(P * P * 3, W))

        def T(x):
            return np.ascontiguousarray(np.swapaxes(x, -1, -2))

        ident = lambda x: x  # noqa: E731
        plan = {
            f'{prefix}embeddings.patch_embedding.weight':
                (('patch_embed',), conv_to_mat, None),
            f'{prefix}embeddings.class_embedding': (('class_embed',), ident, None),
            f'{prefix}embeddings.position_embedding.weight':
                (('pos_embed',), ident, None),
            f'{prefix}pre_layrnorm.weight': (('pre_ln_w',), ident, None),
            f'{prefix}pre_layrnorm.bias': (('pre_ln_b',), ident, None),
        }
        per_layer = [
            ('layer_norm1.weight', 'ln1_w', ident), ('layer_norm1.bias', 'ln1_b', ident),
            ('self_attn.q_proj.weight', 'wq', T), ('self_attn.q_proj.bias', 'bq', ident),
            ('self_attn.k_proj.weight', 'wk', T), ('self_attn.k_proj.bias', 'bk', ident),
            ('self_attn.v_proj.weight', 'wv', T), ('self_attn.v_proj.bias', 'bv', ident),
            ('self_attn.out_proj.weight', 'wo', T), ('self_attn.out_proj.bias', 'bo', ident),
            ('layer_norm2.weight', 'ln2_w', ident), ('layer_norm2.bias', 'ln2_b', ident),
            ('mlp.fc1.weight', 'fc1', T), ('mlp.fc1.bias', 'b1', ident),
            ('mlp.fc2.weight', 'fc2', T), ('mlp.fc2.bias', 'b2', ident),
        ]
        for hf, name, transform in per_layer:
            for layer in range(self.num_layers):
                plan[f'{prefix}encoder.layers.{layer}.{hf}'] = (
                    ('layers', name, layer), transform, None)
        return plan

    # -- forward -----------------------------------------------------------------------
    def forward(self, params, pixel_values: jax.Array) -> jax.Array:
        """pixel_values [N, S, S, 3] float -> features [N, T, W].

        T = num_patches (+1 with 'full' select strategy).
        """
        N = pixel_values.shape[0]
        P, G, W = self.patch_size, self.grid, self.width
        dtype = params['patch_embed'].dtype
        x = pixel_values.astype(dtype)
        # unfold into patches: [N, G, P, G, P, 3] -> [N, G*G, P*P*3]
        x = x.reshape(N, G, P, G, P, 3).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(N, G * G, P * P * 3)
        x = x @ params['patch_embed']                              # [N, nP, W]
        cls = jnp.broadcast_to(params['class_embed'], (N, 1, W))
        x = jnp.concatenate([cls, x], axis=1) + params['pos_embed']
        x = _layer_norm(x, params['pre_ln_w'], params['pre_ln_b'], self.eps)

        H = self.heads
        D = W // H
        scale = 1.0 / math.sqrt(D)
        S = x.shape[1]

        def layer_fn(h, w):
            y = _layer_norm(h, w['ln1_w'], w['ln1_b'], self.eps)
            q = (y @ w['wq'] + w['bq']).reshape(N, S, H, D)
            k = (y @ w['wk'] + w['bk']).reshape(N, S, H, D)
            v = (y @ w['wv'] + w['bv']).reshape(N, S, H, D)
            att = jnp.einsum('nqhd,nkhd->nhqk', q, k) * scale
            att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(h.dtype)
            o = jnp.einsum('nhqk,nkhd->nqhd', att, v).reshape(N, S, W)
            h = h + o @ w['wo'] + w['bo']
            y = _layer_norm(h, w['ln2_w'], w['ln2_b'], self.eps)
            y = self.act(y @ w['fc1'] + w['b1'])
            h = h + y @ w['fc2'] + w['b2']
            return h, None

        x, _ = jax.lax.scan(layer_fn, x, params['layers'])
        if self.select_strategy == 'default':
            x = x[:, 1:]                                           # drop CLS
        return x


def _layer_norm(x, w, b, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w + b


class InternViTTower:
    """InternViT encoder (InternVL family): fused-qkv pre-norm ViT with
    layer-scale, optional QK-RMSNorm (6B variant) and layer_norm/rms_norm
    selectable per config.  Reference analog: ``lmdeploy/vl/model/internvl.py``
    (wrapping HF InternVisionModel).

    Output is the patch grid [N, G, G, W] (CLS dropped) — the InternVL model
    applies pixel-shuffle + the mlp1 projector on top.
    """

    def __init__(self, vision_config: Dict):
        vc = vision_config

        def _sq(v):   # HF InternVLVisionConfig stores [h, w] lists
            return int(v[0]) if isinstance(v, (list, tuple)) else int(v)

        self.image_size = _sq(vc.get('image_size', 448))
        self.patch_size = _sq(vc.get('patch_size', 14))
        self.width = vc.get('hidden_size', 1024)
        self.heads = vc.get('num_attention_heads', 16)
        self.mlp_dim = vc.get('intermediate_size', 4096)
        self.num_layers = vc.get('num_hidden_layers', 24)
        self.eps = vc.get('layer_norm_eps', 1e-6)
        self.qk_norm = vc.get('qk_normalization',
                              vc.get('use_qk_norm', False))
        self.rms = vc.get('norm_type', 'layer_norm') == 'rms_norm'
        self.act = _ACTS.get(vc.get('hidden_act', 'gelu'), jax.nn.gelu)
        self.grid = self.image_size // self.patch_size
        self.num_patches = self.grid * self.grid

    def param_shapes(self) -> Dict:
        P, W, L, H = self.patch_size, self.width, self.num_layers, self.heads
        D = W // H
        layers = {
            'n1_w': (L, W), 'n2_w': (L, W),
            'wqkv': (L, W, 3 * W), 'bqkv': (L, 3 * W),
            'wo': (L, W, W), 'bo': (L, W),
            'ls1': (L, W), 'ls2': (L, W),
            'fc1': (L, W, self.mlp_dim), 'b1': (L, self.mlp_dim),
            'fc2': (L, self.mlp_dim, W), 'b2': (L, W),
        }
        if not self.rms:
            layers.update(n1_b=(L, W), n2_b=(L, W))
        if self.qk_norm:
            layers.update(q_norm=(L, W), k_norm=(L, W))
        return {
            'patch_embed': (P * P * 3, W), 'patch_bias': (W,),
            'class_embed': (W,),
            'pos_embed': (self.num_patches + 1, W),
            'layers': layers,
        }

    def init_params(self, dtype=jnp.float32):
        rng = np.random.default_rng(5)

        def mk(name, shape):
            if name.startswith(('n1_w', 'n2_w')) or 'norm' in name or \
                    name.startswith('ls'):
                return jnp.ones(shape, dtype)
            if name.startswith(('b', 'n1_b', 'n2_b', 'patch_bias')):
                return jnp.zeros(shape, dtype)
            return jnp.asarray(rng.normal(0, 0.02, shape), dtype)

        def walk(tree):
            return {k: walk(v) if isinstance(v, dict) else mk(k, v)
                    for k, v in tree.items()}

        return walk(self.param_shapes())

    def make_assign_plan(self, prefix: str = 'vision_model.'):
        P, W = self.patch_size, self.width

        def conv_to_mat(x):
            return np.ascontiguousarray(
                np.transpose(x, (2, 3, 1, 0)).reshape(P * P * 3, W))

        def T(x):
            return np.ascontiguousarray(np.swapaxes(x, -1, -2))

        ident = lambda x: x  # noqa: E731
        plan = {
            f'{prefix}embeddings.patch_embedding.weight':
                (('patch_embed',), conv_to_mat, None),
            f'{prefix}embeddings.patch_embedding.bias':
                (('patch_bias',), ident, None),
            f'{prefix}embeddings.class_embedding':
                (('class_embed',), lambda x: x.reshape(-1), None),
            f'{prefix}embeddings.position_embedding':
                (('pos_embed',), lambda x: x.reshape(-1, W), None),
        }
        per_layer = [
            ('norm1.weight', 'n1_w', ident), ('norm1.bias', 'n1_b', ident),
            ('norm2.weight', 'n2_w', ident), ('norm2.bias', 'n2_b', ident),
            ('attn.qkv.weight', 'wqkv', T), ('attn.qkv.bias', 'bqkv', ident),
            ('attn.proj.weight', 'wo', T), ('attn.proj.bias', 'bo', ident),
            ('attn.q_norm.weight', 'q_norm', ident),
            ('attn.k_norm.weight', 'k_norm', ident),
            ('ls1', 'ls1', ident), ('ls2', 'ls2', ident),
            ('mlp.fc1.weight', 'fc1', T), ('mlp.fc1.bias', 'b1', ident),
            ('mlp.fc2.weight', 'fc2', T), ('mlp.fc2.bias', 'b2', ident),
        ]
        for hf, name, transform in per_layer:
            for layer in range(self.num_layers):
                plan[f'{prefix}encoder.layers.{layer}.{hf}'] = (
                    ('layers', name, layer), transform, None)
        return plan

    def _norm(self, x, w, b):
        if self.rms:
            x32 = x.astype(jnp.float32)
            var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
            return (x32 * jax.lax.rsqrt(var + self.eps)).astype(x.dtype) * w
        return _layer_norm(x, w, b, self.eps)

    def forward(self, params, pixel_values: jax.Array) -> jax.Array:
        """[N, S, S, 3] -> patch grid [N, G, G, W] (CLS dropped)."""
        N = pixel_values.shape[0]
        P, G, W, H = self.patch_size, self.grid, self.width, self.heads
        D = W // H
        import math as _math
        scale = 1.0 / _math.sqrt(D)
        dtype = params['patch_embed'].dtype
        x = pixel_values.astype(dtype)
        x = x.reshape(N, G, P, G, P, 3).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(N, G * G, P * P * 3) @ params['patch_embed'] \
            + params['patch_bias']
        cls = jnp.broadcast_to(params['class_embed'], (N, 1, W))
        x = jnp.concatenate([cls, x], axis=1) + params['pos_embed']
        S = x.shape[1]
        lp = params['layers']
        has_bias = 'n1_b' in lp

        def layer_fn(h, w):
            y = self._norm(h, w['n1_w'], w.get('n1_b') if has_bias else None)
            qkv = (y @ w['wqkv'] + w['bqkv']).reshape(N, S, 3, H, D)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            if self.qk_norm:
                # InternViT-6B: RMSNorm over the FLATTENED head dim
                def hn(t, wn):
                    flat = t.reshape(N, S, W).astype(jnp.float32)
                    var = jnp.mean(flat * flat, -1, keepdims=True)
                    return ((flat * jax.lax.rsqrt(var + self.eps)) * wn
                            ).astype(t.dtype).reshape(N, S, H, D)
                q, k = hn(q, w['q_norm']), hn(k, w['k_norm'])
            att = jnp.einsum('nqhd,nkhd->nhqk', q, k) * scale
            att = jax.nn.softmax(att.astype(jnp.float32), -1).astype(h.dtype)
            o = jnp.einsum('nhqk,nkhd->nqhd', att, v).reshape(N, S, W)
            h = h + (o @ w['wo'] + w['bo']) * w['ls1']
            y = self._norm(h, w['n2_w'], w.get('n2_b') if has_bias else None)
            y = self.act(y @ w['fc1'] + w['b1'])
            h = h + (y @ w['fc2'] + w['b2']) * w['ls2']
            return h, None

        x, _ = jax.lax.scan(layer_fn, x, lp)
        return x[:, 1:].reshape(N, G, G, W)


def pixel_shuffle(x: jax.Array, ratio: float) -> jax.Array:
    """[N, G, G, W] -> [N, G*r, G*r, W/(r*r)] spatial-to-channel fold
    (InternVL downsampling, ratio typically 0.5 -> 4x fewer tokens)."""
    N, G, _, W = x.shape
    s = int(round(1 / ratio))
    x = x.reshape(N, G // s, s, G // s, s, W)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(N, G // s, G // s, s * s * W)
    return x


class SiglipVisionTower(ClipVisionTower):
    """SigLIP ViT (gemma3 / minicpm-v towers): no class token, biased patch
    embed, no pre-layernorm, final post_layernorm, tanh-gelu MLP.

    Reference analog: transformers SiglipVisionModel as used by
    ``lmdeploy/pytorch/models/gemma3_vl.py`` (vision_tower).
    """

    def __init__(self, vision_config: Dict):
        vc = dict(vision_config)
        vc.setdefault('hidden_act', 'gelu_pytorch_tanh')
        vc.setdefault('layer_norm_eps', 1e-6)
        super().__init__(vc, feature_layer=vc.get('num_hidden_layers', 27),
                         select_strategy='siglip')
        self.num_image_tokens = self.num_patches

    def param_shapes(self) -> Dict:
        shapes = super().param_shapes()
        for k in ('class_embed', 'pre_ln_w', 'pre_ln_b'):
            shapes.pop(k)
        W = self.width
        shapes['patch_embed_b'] = (W,)
        shapes['pos_embed'] = (self.num_patches, W)
        shapes['post_ln_w'] = (W,)
        shapes['post_ln_b'] = (W,)
        return shapes

    def make_assign_plan(self, prefix: str = 'vision_tower.vision_model.'):
        plan = super().make_assign_plan(prefix)
        for k in (f'{prefix}embeddings.class_embedding',
                  f'{prefix}pre_layrnorm.weight',
                  f'{prefix}pre_layrnorm.bias'):
            plan.pop(k, None)
        ident = lambda x: x  # noqa: E731
        plan[f'{prefix}embeddings.patch_embedding.bias'] = \
            (('patch_embed_b',), ident, None)
        plan[f'{prefix}post_layernorm.weight'] = (('post_ln_w',), ident, None)
        plan[f'{prefix}post_layernorm.bias'] = (('post_ln_b',), ident, None)
        return plan

    def forward(self, params, pixel_values: jax.Array) -> jax.Array:
        """pixel_values [N, S, S, 3] -> features [N, num_patches, W]."""
        N = pixel_values.shape[0]
        P, G, W = self.patch_size, self.grid, self.width
        dtype = params['patch_embed'].dtype
        x = pixel_values.astype(dtype)
        x = x.reshape(N, G, P, G, P, 3).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(N, G * G, P * P * 3)
        x = x @ params['patch_embed'] + params['patch_embed_b']
        x = x + params['pos_embed']

        H = self.heads
        D = W // H
        scale = 1.0 / math.sqrt(D)
        S = x.shape[1]

        def layer_fn(h, w):
            y = _layer_norm(h, w['ln1_w'], w['ln1_b'], self.eps)
            q = (y @ w['wq'] + w['bq']).reshape(N, S, H, D)
            k = (y @ w['wk'] + w['bk']).reshape(N, S, H, D)
            v = (y @ w['wv'] + w['bv']).reshape(N, S, H, D)
            att = jnp.einsum('nqhd,nkhd->nhqk', q, k) * scale
            att = jax.nn.softmax(att.astype(jnp.float32),
                                 axis=-1).astype(h.dtype)
            o = jnp.einsum('nhqk,nkhd->nqhd', att, v).reshape(N, S, W)
            h = h + o @ w['wo'] + w['bo']
            y = _layer_norm(h, w['ln2_w'], w['ln2_b'], self.eps)
            y = self.act(y @ w['fc1'] + w['b1'])
            h = h + y @ w['fc2'] + w['b2']
            return h, None

        x, _ = jax.lax.scan(layer_fn, x, params['layers'])
        return _layer_norm(x, params['post_ln_w'], params['post_ln_b'],
                           self.eps)
