"""Qwen2-VL / Qwen2.5-VL: native-resolution ViT tower + mrope language model.

Reference analog: ``lmdeploy/pytorch/models/qwen2_vl.py`` (mrope position ids
:777-816, section-wise rotary :266-270) and ``lmdeploy/vl/model/qwen2.py``.

TPU-first design:
  * The tower consumes pre-patchified pixels ``[n, C*tp*P*P]`` (host numpy does
    the unfold; see vl/qwen_vl.py) — patch embedding is ONE matmul on the MXU,
    no Conv3d lowering.
  * Variable image geometry is handled with STATIC per-shape compiles: all
    position/window metadata (2D rope positions, frame ids, window ids) is
    computed host-side per grid and shipped as arrays; the jitted encoder is
    shape-polymorphic only through retracing.
  * Qwen2.5-VL window attention is expressed as a same-window MASK instead of
    HF's gather/scatter window reordering — attention sets are identical, so
    numerics match, but the token order never changes and the 2x2 merger can
    consume contiguous groups.
  * The language half reuses the llama/qwen2 scan decoder; mrope enters through
    the ``_gather_rope`` hook: prefill passes [B,T,3] multimodal positions,
    decode passes ordinary [B,1] positions pre-shifted by the per-sequence
    mrope delta (all three mrope components are equal for text tokens, so
    decode rope == standard rope at position + delta).
"""
from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..nn.layers import gather_mrope, rms_norm
from .llama import LlamaModel
from .vision import quick_gelu, _layer_norm


def mrope_positions(token_ids: Sequence[int], image_token_id: int,
                    grids: Sequence[Tuple[int, int, int]], merge: int = 2,
                    start: int = 0) -> Tuple[np.ndarray, int]:
    """(t, h, w) position ids for an expanded prompt (HF get_rope_index
    semantics; reference qwen2_vl.py _get_multimodal_pos_ids).

    Returns (pos [n, 3] int32, next_pos).  Text tokens advance all three
    components together; an image span of grid (t, h, w) occupies
    ``t*(h/merge)*(w/merge)`` tokens whose components enumerate the grid, and
    the cursor then jumps to ``cur + max(t, h/merge, w/merge)``.
    """
    ids = np.asarray(token_ids)
    pos = np.zeros((len(ids), 3), np.int32)
    cur = start
    img = 0
    i = 0
    n_total = len(ids)
    while i < n_total:
        if img < len(grids) and ids[i] == image_token_id:
            t, h, w = grids[img]
            img += 1
            hm, wm = h // merge, w // merge
            n = t * hm * wm
            pos[i:i + n, 0] = cur + np.repeat(np.arange(t, dtype=np.int32),
                                              hm * wm)
            pos[i:i + n, 1] = cur + np.tile(
                np.repeat(np.arange(hm, dtype=np.int32), wm), t)
            pos[i:i + n, 2] = cur + np.tile(np.arange(wm, dtype=np.int32),
                                            t * hm)
            cur += int(max(t, hm, wm))
            i += n
        else:
            pos[i] = cur
            cur += 1
            i += 1
    return pos, cur


def patch_metadata(grid: Tuple[int, int, int], merge: int,
                   win_tokens: int) -> Dict[str, np.ndarray]:
    """Per-patch (h, w) rope positions, frame ids and window ids for one image,
    in the merge-block raster order the processor emits patches in."""
    t, gh, gw = grid
    hb, wb = gh // merge, gw // merge
    ii, jj = np.meshgrid(np.arange(merge), np.arange(merge), indexing='ij')
    hpos = (np.arange(hb)[:, None, None, None] * merge
            + ii[None, None]).astype(np.int32)        # [hb, 1, m, m]
    wpos = (np.arange(wb)[None, :, None, None] * merge
            + jj[None, None]).astype(np.int32)        # [1, wb, m, m]
    hpos = np.broadcast_to(hpos, (hb, wb, merge, merge)).reshape(-1)
    wpos = np.broadcast_to(wpos, (hb, wb, merge, merge)).reshape(-1)
    hpos = np.tile(hpos, t)
    wpos = np.tile(wpos, t)
    frame = np.repeat(np.arange(t, dtype=np.int32), hb * wb * merge * merge)
    # Qwen2.5-VL windows partition the MERGED grid into win_tokens x win_tokens
    # tiles (HF pads the grid; padding tokens are masked out there — the
    # partition of real tokens is identical)
    n_wcols = -(-wb // win_tokens) if win_tokens else 1
    mh, mw = hpos // merge, wpos // merge
    win = (mh // max(win_tokens, 1)) * n_wcols + mw // max(win_tokens, 1)
    win = win + frame * (n_wcols * (-(-hb // max(win_tokens, 1))))
    return {'hpos': hpos, 'wpos': wpos, 'frame': frame,
            'win': win.astype(np.int32)}


class Qwen2VLTower:
    """Functional Qwen2-VL / 2.5-VL vision encoder over pre-unfolded patches."""

    def __init__(self, vision_config: Dict):
        vc = vision_config
        self.v25 = (vc.get('model_type') == 'qwen2_5_vl'
                    or 'out_hidden_size' in vc
                    or 'fullatt_block_indexes' in vc)
        self.depth = vc.get('depth', 32)
        # qwen2-vl names the width embed_dim; 2.5 renames it hidden_size
        self.width = vc.get('embed_dim') or vc.get('hidden_size', 1280)
        self.heads = vc.get('num_heads', 16)
        self.patch_size = vc.get('patch_size', 14)
        self.merge = vc.get('spatial_merge_size', 2)
        self.temporal_patch = vc.get('temporal_patch_size', 2)
        self.channels = vc.get('in_channels', 3)
        if self.v25:
            self.mlp_dim = vc.get('intermediate_size', 3420)
            self.out_hidden = vc.get('out_hidden_size', 3584)
            self.window = vc.get('window_size', 112)
            self.fullatt = set(vc.get('fullatt_block_indexes', [7, 15, 23, 31]))
        else:
            self.mlp_dim = self.width * int(vc.get('mlp_ratio', 4))
            self.out_hidden = vc.get('hidden_size', 3584)
            self.window = 0
            self.fullatt = set(range(self.depth))
        self.head_dim = self.width // self.heads
        self.feat_dim = self.channels * self.temporal_patch * self.patch_size ** 2
        self.win_tokens = (self.window // (self.merge * self.patch_size)
                           if self.window else 0)
        self.eps = 1e-6
        # host-precomputed 2D rope inverse frequencies [head_dim/4]
        d4 = self.head_dim // 4
        self.inv_freq = (1.0 / 10000.0 ** (np.arange(d4, dtype=np.float32)
                                           * 2 / (self.head_dim // 2)))

    # -- params ------------------------------------------------------------------------
    def param_shapes(self) -> Dict:
        E, L, M, H = self.width, self.depth, self.mlp_dim, self.out_hidden
        C = E * self.merge * self.merge
        layers = {
            'ln1_w': (L, E), 'ln1_b': (L, E),
            'qkv': (L, E, 3 * E), 'qkv_b': (L, 3 * E),
            'wo': (L, E, E), 'bo': (L, E),
            'ln2_w': (L, E), 'ln2_b': (L, E),
        }
        if self.v25:
            layers.update({'w_gate': (L, E, M), 'b_gate': (L, M),
                           'w_up': (L, E, M), 'b_up': (L, M),
                           'w_down': (L, M, E), 'b_down': (L, E)})
        else:
            layers.update({'fc1': (L, E, M), 'b1': (L, M),
                           'fc2': (L, M, E), 'b2': (L, E)})
        return {
            'patch_embed': (self.feat_dim, E),
            'ln_q_w': (E,), 'ln_q_b': (E,),
            'merge0': (C, C), 'merge0_b': (C,),
            'merge2': (C, H), 'merge2_b': (H,),
            'layers': layers,
        }

    def init_params(self, dtype=jnp.float32):
        rng = np.random.default_rng(11)

        def make(name, shape):
            if name.startswith('ln') and name.endswith('_w'):
                return jnp.ones(shape, dtype)
            if name.endswith('_b') or name.startswith('b'):
                return jnp.zeros(shape, dtype)
            return jnp.asarray(rng.normal(0, 0.02, shape), dtype)

        def walk(tree):
            return {k: walk(v) if isinstance(v, dict) else make(k, v)
                    for k, v in tree.items()}

        return walk(self.param_shapes())

    def make_assign_plan(self, prefix: str = 'visual.'):
        E = self.width

        def conv_to_mat(x):     # [E, C, tp, P, P] -> [C*tp*P*P, E]
            return np.ascontiguousarray(x.reshape(E, -1).T)

        def T(x):
            return np.ascontiguousarray(np.swapaxes(x, -1, -2))

        ident = lambda x: x  # noqa: E731
        plan = {
            f'{prefix}patch_embed.proj.weight': (('patch_embed',), conv_to_mat,
                                                 None),
            f'{prefix}merger.ln_q.weight': (('ln_q_w',), ident, None),
            f'{prefix}merger.mlp.0.weight': (('merge0',), T, None),
            f'{prefix}merger.mlp.0.bias': (('merge0_b',), ident, None),
            f'{prefix}merger.mlp.2.weight': (('merge2',), T, None),
            f'{prefix}merger.mlp.2.bias': (('merge2_b',), ident, None),
        }
        if not self.v25:
            plan[f'{prefix}merger.ln_q.bias'] = (('ln_q_b',), ident, None)
        per_layer = [
            ('norm1.weight', 'ln1_w', ident), ('norm2.weight', 'ln2_w', ident),
            ('attn.qkv.weight', 'qkv', T), ('attn.qkv.bias', 'qkv_b', ident),
            ('attn.proj.weight', 'wo', T), ('attn.proj.bias', 'bo', ident),
        ]
        if self.v25:
            per_layer += [
                ('mlp.gate_proj.weight', 'w_gate', T),
                ('mlp.gate_proj.bias', 'b_gate', ident),
                ('mlp.up_proj.weight', 'w_up', T),
                ('mlp.up_proj.bias', 'b_up', ident),
                ('mlp.down_proj.weight', 'w_down', T),
                ('mlp.down_proj.bias', 'b_down', ident),
            ]
        else:
            per_layer += [
                ('norm1.bias', 'ln1_b', ident), ('norm2.bias', 'ln2_b', ident),
                ('mlp.fc1.weight', 'fc1', T), ('mlp.fc1.bias', 'b1', ident),
                ('mlp.fc2.weight', 'fc2', T), ('mlp.fc2.bias', 'b2', ident),
            ]
        for layer in range(self.depth):
            for hf, name, tr in per_layer:
                plan[f'{prefix}blocks.{layer}.{hf}'] = \
                    (('layers', name, layer), tr, None)
        return plan

    # -- forward -----------------------------------------------------------------------
    def forward(self, params, pixels: jax.Array, hpos: jax.Array,
                wpos: jax.Array, frame: jax.Array, win: jax.Array) -> jax.Array:
        """pixels [n, feat_dim] -> merged features [n / merge^2, out_hidden]."""
        E, Hh, Dh = self.width, self.heads, self.head_dim
        n = pixels.shape[0]
        x = jnp.dot(pixels, params['patch_embed'],
                    preferred_element_type=jnp.float32).astype(pixels.dtype)

        inv = jnp.asarray(self.inv_freq)
        ang = jnp.concatenate([hpos[:, None] * inv[None, :],
                               wpos[:, None] * inv[None, :]], axis=-1)
        cos, sin = jnp.cos(ang), jnp.sin(ang)          # [n, Dh/2]

        full_mask = frame[:, None] == frame[None, :]
        win_mask = full_mask & (win[:, None] == win[None, :])
        neg = jnp.asarray(-1e30, jnp.float32)
        scale = 1.0 / math.sqrt(Dh)

        def norm(x_, w, b):
            if self.v25:
                return rms_norm(x_, w, self.eps)
            return _layer_norm(x_, w, b, self.eps)

        def rot(v):
            d2 = v.shape[-1] // 2
            v1, v2 = v[..., :d2].astype(jnp.float32), v[..., d2:].astype(jnp.float32)
            c, s = cos[:, None, :], sin[:, None, :]
            return jnp.concatenate([v1 * c - v2 * s, v2 * c + v1 * s],
                                   axis=-1).astype(v.dtype)

        def layer_fn(x, w):
            mask = jnp.where(w['use_full'], full_mask, win_mask)
            h = norm(x, w['ln1_w'], w['ln1_b'])
            qkv = (jnp.dot(h, w['qkv'], preferred_element_type=jnp.float32)
                   + w['qkv_b']).astype(x.dtype)
            q, k, v = [a.reshape(n, Hh, Dh)
                       for a in jnp.split(qkv, 3, axis=-1)]
            q, k = rot(q), rot(k)
            logits = jnp.einsum('qhd,khd->hqk', q.astype(jnp.float32),
                                k.astype(jnp.float32)) * scale
            logits = jnp.where(mask[None], logits, neg)
            p = jax.nn.softmax(logits, axis=-1)
            attn = jnp.einsum('hqk,khd->qhd', p, v.astype(jnp.float32))
            attn = attn.reshape(n, E).astype(x.dtype)
            x = x + (jnp.dot(attn, w['wo'], preferred_element_type=jnp.float32)
                     + w['bo']).astype(x.dtype)
            h = norm(x, w['ln2_w'], w['ln2_b'])
            if self.v25:
                g = (jnp.dot(h, w['w_gate'], preferred_element_type=jnp.float32)
                     + w['b_gate'])
                u = (jnp.dot(h, w['w_up'], preferred_element_type=jnp.float32)
                     + w['b_up'])
                m = (jax.nn.silu(g) * u).astype(x.dtype)
                out = (jnp.dot(m, w['w_down'],
                               preferred_element_type=jnp.float32)
                       + w['b_down'])
            else:
                m = (jnp.dot(h, w['fc1'], preferred_element_type=jnp.float32)
                     + w['b1'])
                m = quick_gelu(m).astype(x.dtype)
                out = (jnp.dot(m, w['fc2'],
                               preferred_element_type=jnp.float32) + w['b2'])
            return x + out.astype(x.dtype), None

        lp = dict(params['layers'])
        lp['use_full'] = jnp.asarray(
            [i in self.fullatt for i in range(self.depth)])
        x, _ = jax.lax.scan(layer_fn, x, lp)

        # 2x2 spatial merger
        x = norm(x, params['ln_q_w'], params['ln_q_b'])
        x = x.reshape(n // (self.merge ** 2), -1)
        x = (jnp.dot(x, params['merge0'], preferred_element_type=jnp.float32)
             + params['merge0_b'])
        x = jax.nn.gelu(x, approximate=False).astype(pixels.dtype)
        x = (jnp.dot(x, params['merge2'], preferred_element_type=jnp.float32)
             + params['merge2_b'])
        return x


class _Qwen2VLMixin:
    """VLM surface mixed over the qwen2 LM base."""

    uses_mrope = True

    def _init_vision(self, config: ModelConfig):
        vis = config.vision or {}
        self.tower = Qwen2VLTower(vis.get('vision_config', {}))
        self.image_token_index = vis.get('image_token_index')
        self.image_marker = '<|image_pad|>'
        scaling = config.rope_scaling or {}
        self.mrope_section = tuple(scaling.get('mrope_section') or
                                   (config.head_dim // 6,) * 3)
        self._encode_jit = None

    # engine-facing helpers ------------------------------------------------------------
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
        # transformers >= 4.52 checkpoints nest the tower under model.visual.
        plan.update({'model.' + k: v for k, v in list(plan.items())})
        return plan

    def encode_images_raw(self, vis_params, images) -> Tuple[List[np.ndarray],
                                                             List[Tuple]]:
        """Host entry: raw images -> ([merged feature arrays], [grid_thw]).

        One jitted tower call per image geometry (retraces per shape; repeated
        geometries hit the jit cache).
        """
        from ..vl.qwen_vl import QwenVLImageProcessor
        proc = QwenVLImageProcessor(patch_size=self.tower.patch_size,
                                    merge_size=self.tower.merge,
                                    temporal_patch=self.tower.temporal_patch)
        if self._encode_jit is None:
            self._encode_jit = jax.jit(self.tower.forward)
        feats, grids = [], []
        for img in images:
            pixels, grid = proc(img)
            md = patch_metadata(grid, self.tower.merge, self.tower.win_tokens)
            out = self._encode_jit(vis_params, jnp.asarray(pixels),
                                   jnp.asarray(md['hpos']),
                                   jnp.asarray(md['wpos']),
                                   jnp.asarray(md['frame']),
                                   jnp.asarray(md['win']))
            feats.append(np.asarray(out, np.float32))
            grids.append(grid)
        return feats, grids

    def build_mrope(self, token_ids, grids, start: int = 0):
        return mrope_positions(token_ids, self.image_token_index, grids,
                               merge=self.tower.merge, start=start)

    def make_assign_plan(self):
        # transformers >= 4.52 nests the LM under model.language_model.
        base = super().make_assign_plan()
        plan = dict(base)
        for k, v in base.items():
            if k.startswith('model.'):
                plan['model.language_model.' + k[len('model.'):]] = v
        return plan


def build_qwen2_vl(config: ModelConfig):
    cls = type('Qwen2VLModel', (_Qwen2VLMixin, LlamaModel), {})
    config.attention_bias = True
    model = cls(config)
    model._init_vision(config)
    return model
