"""MiniCPM-V 2.6: sliced SigLIP tower + perceiver resampler + Qwen2 LM.

Reference analog: ``lmdeploy/pytorch/models/minicpmv26.py`` (the LM — qwen2
attention with bias + sliding window, weights under the ``llm.`` prefix) and
``lmdeploy/vl/model/minicpmv.py`` (slice-mode preprocessing driving the HF
vision tower + resampler).  The vision side here is native:

  * slice preprocessing — ``multiple = ceil(w*h/448^2)`` candidate grids
    (±1, capped at max_slice_nums), best grid by log-aspect distance; the
    source view plus each slice resized to ~448^2 px with 14-multiple dims
  * a rectangular SigLIP forward: patch rows bucketed into the square
    pos-embed table (``floor(i/h*G)*G + floor(j/w*G)``, the NaViT-style
    scheme of the public MiniCPM-V code)
  * the 2.6 resampler: ``MHA(ln_q(query), ln_kv(kv_proj(x)) + pos_2d, ...)``
    with 2D sincos key positions, ln_post and the final proj matrix —
    ``query_num`` tokens per view

Each image contributes ``query_num * (1 + num_slices)`` contiguous feature
positions at its placeholder (slice separator tokens are not re-inserted).
"""
from __future__ import annotations

import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from .llama import LlamaModel
from .vision import SiglipVisionTower

SCALE_RES = 448
PATCH = 14


def _ensure_divide(v: float, patch: int = PATCH) -> int:
    return max(int(round(v / patch)) * patch, patch)


def _best_size(w: int, h: int, scale: int = SCALE_RES) -> Tuple[int, int]:
    r = w / h
    hh = int(scale / math.sqrt(r))
    ww = int(hh * r)
    return _ensure_divide(ww), _ensure_divide(hh)


def best_grid(w: int, h: int, max_slice_nums: int = 9) -> Tuple[int, int]:
    """(cols, rows); (1, 1) means no slicing."""
    multiple = int(np.ceil(w * h / (SCALE_RES * SCALE_RES)))
    if multiple <= 1:
        return (1, 1)
    candidates = [m for m in (multiple - 1, multiple, multiple + 1)
                  if 2 <= m <= max_slice_nums]
    ratio = math.log(w / h)
    best, score = (1, 1), float('inf')
    for m in candidates:
        for cols in range(1, m + 1):
            if m % cols:
                continue
            rows = m // cols
            s = abs(ratio - math.log(cols / rows))
            if s < score:
                best, score = (cols, rows), s
    return best


def slice_views(img, max_slice_nums: int = 9) -> List[np.ndarray]:
    """PIL image -> [source view, slice views...] float arrays in [0,1]."""
    from ..vl.processor import load_image
    img = load_image(img).convert('RGB')
    w, h = img.size
    views = []
    sw, sh = _best_size(w, h)
    views.append(np.asarray(img.resize((sw, sh)), np.float32) / 255.0)
    cols, rows = best_grid(w, h, max_slice_nums)
    if cols * rows > 1:
        pw, ph = _best_size(w / cols, h / rows)
        grid_img = np.asarray(img.resize((pw * cols, ph * rows)),
                              np.float32) / 255.0
        for r in range(rows):
            for c in range(cols):
                views.append(grid_img[r * ph:(r + 1) * ph,
                                      c * pw:(c + 1) * pw])
    return views


def sincos_2d(h: int, w: int, dim: int) -> np.ndarray:
    """2D sincos position embedding [h*w, dim] (half per axis)."""
    def axis(pos, d):
        omega = 1.0 / (10000 ** (np.arange(d // 2, dtype=np.float32)
                                 / (d // 2)))
        out = pos[:, None] * omega[None]
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    gh = axis(np.arange(h, dtype=np.float32), dim // 2)   # [h, dim/2]
    gw = axis(np.arange(w, dtype=np.float32), dim // 2)   # [w, dim/2]
    emb = np.concatenate([
        np.repeat(gh[:, None], w, axis=1),
        np.repeat(gw[None, :], h, axis=0)], axis=-1)       # [h, w, dim]
    return emb.reshape(h * w, dim).astype(np.float32)


class MiniCPMVTower(SiglipVisionTower):
    """SigLIP with rectangular inputs + bucketed position ids."""

    def patches_of(self, view: np.ndarray, mean, std
                   ) -> Tuple[np.ndarray, np.ndarray, Tuple[int, int]]:
        """[H, W, 3] -> (patches [L, P*P*3], pos_ids [L], (gh, gw))."""
        P = self.patch_size
        H, W, _ = view.shape
        gh, gw = H // P, W // P
        x = (view[:gh * P, :gw * P] - np.asarray(mean)) / np.asarray(std)
        x = x.reshape(gh, P, gw, P, 3).transpose(0, 2, 1, 3, 4)
        patches = x.reshape(gh * gw, P * P * 3).astype(np.float32)
        G = self.grid
        bi = np.floor(np.arange(gh) / gh * G).astype(np.int32)
        bj = np.floor(np.arange(gw) / gw * G).astype(np.int32)
        pos_ids = (bi[:, None] * G + bj[None, :]).reshape(-1)
        return patches, pos_ids, (gh, gw)

    def forward_rect(self, params, patches: jax.Array, pos_ids: jax.Array
                     ) -> jax.Array:
        """[L, P*P*3] + [L] bucketed ids -> [L, W] post-layernormed."""
        x = patches @ params['patch_embed'] + params['patch_embed_b']
        x = x + params['pos_embed'][pos_ids]
        x = x[None]                                       # [1, L, W]
        Hn, Wd = self.heads, self.width
        D = Wd // Hn
        scale = 1.0 / math.sqrt(D)
        S = x.shape[1]
        from .vision import _layer_norm

        def layer_fn(h, w):
            y = _layer_norm(h, w['ln1_w'], w['ln1_b'], self.eps)
            q = (y @ w['wq'] + w['bq']).reshape(1, S, Hn, D)
            k = (y @ w['wk'] + w['bk']).reshape(1, S, Hn, D)
            v = (y @ w['wv'] + w['bv']).reshape(1, S, Hn, D)
            att = jnp.einsum('nqhd,nkhd->nhqk', q, k) * scale
            att = jax.nn.softmax(att.astype(jnp.float32), -1).astype(h.dtype)
            o = jnp.einsum('nhqk,nkhd->nqhd', att, v).reshape(1, S, Wd)
            h = h + o @ w['wo'] + w['bo']
            y = _layer_norm(h, w['ln2_w'], w['ln2_b'], self.eps)
            y = self.act(y @ w['fc1'] + w['b1']) @ w['fc2'] + w['b2']
            return h + y

        for li in range(self.num_layers):
            w = {k: v[li] for k, v in params['layers'].items()}
            x = layer_fn(x, w)
        x = _layer_norm(x, params['post_ln_w'], params['post_ln_b'], self.eps)
        return x[0]


class MiniCPMV26Model(LlamaModel):
    """MiniCPMVForCausalLM (MiniCPM-V 2.6)."""

    image_marker = '(<image>./</image>)'

    def make_assign_plan(self):
        # checkpoint nests the LM under ``llm.`` (reference load_weights
        # named_parameters(prefix='llm'))
        base = super().make_assign_plan()
        plan = dict(base)
        for k, v in base.items():
            plan['llm.' + k] = v
        return plan

    # -- vision -----------------------------------------------------------------------
    def _init_vision(self, config: ModelConfig):
        vis = config.vision or {}
        hf = config.hf_config or {}
        vc = vis.get('vision_config') or hf.get('vision_config') or {}
        self.tower = MiniCPMVTower(vc)
        self.query_num = hf.get('query_num', vis.get('query_num', 64))
        self.max_slice_nums = hf.get('max_slice_nums', 9)
        self.image_token_index = hf.get('image_token_id') \
            or vis.get('image_token_index')
        self.image_mean = tuple(vc.get('image_mean', (0.5, 0.5, 0.5)))
        self.image_std = tuple(vc.get('image_std', (0.5, 0.5, 0.5)))
        self._encode_jit = None

    def vis_param_shapes(self) -> Dict:
        H = self.config.hidden_size
        Wv = self.tower.width
        return {
            'tower': self.tower.param_shapes(),
            'query': (self.query_num, H),
            'kv_proj_w': (Wv, H),
            'attn_in_w': (3 * H, H), 'attn_in_b': (3 * H,),
            'attn_out_w': (H, H), 'attn_out_b': (H,),
            'ln_q_w': (H,), 'ln_q_b': (H,),
            'ln_kv_w': (H,), 'ln_kv_b': (H,),
            'ln_post_w': (H,), 'ln_post_b': (H,),
            'proj': (H, H),
        }

    def init_vis_params(self, dtype=jnp.float32):
        rng = np.random.RandomState(0)
        shapes = self.vis_param_shapes()

        def walk(tree):
            out = {}
            for k, v in tree.items():
                if isinstance(v, dict):
                    out[k] = walk(v)
                else:
                    out[k] = jnp.asarray(
                        rng.randn(*v).astype(np.float32) * 0.02, dtype)
            return out

        tower = self.tower.init_params(dtype=dtype)
        out = walk({k: v for k, v in shapes.items() if k != 'tower'})
        out['tower'] = tower
        return out

    def vis_assign_plan(self):
        plan = {}
        for k, v in self.tower.make_assign_plan('vpm.').items():
            plan[k] = (('tower',) + v[0], v[1], v[2])
        ident = lambda x: np.asarray(x)  # noqa: E731

        def T(x):
            return np.ascontiguousarray(np.swapaxes(np.asarray(x), -1, -2))

        r = 'resampler.'
        plan.update({
            r + 'query': (('query',), ident, None),
            r + 'kv_proj.weight': (('kv_proj_w',), T, None),
            r + 'attn.in_proj_weight': (('attn_in_w',), ident, None),
            r + 'attn.in_proj_bias': (('attn_in_b',), ident, None),
            r + 'attn.out_proj.weight': (('attn_out_w',), ident, None),
            r + 'attn.out_proj.bias': (('attn_out_b',), ident, None),
            r + 'ln_q.weight': (('ln_q_w',), ident, None),
            r + 'ln_q.bias': (('ln_q_b',), ident, None),
            r + 'ln_kv.weight': (('ln_kv_w',), ident, None),
            r + 'ln_kv.bias': (('ln_kv_b',), ident, None),
            r + 'ln_post.weight': (('ln_post_w',), ident, None),
            r + 'ln_post.bias': (('ln_post_b',), ident, None),
            r + 'proj': (('proj',), ident, None),
        })
        return plan

    # -- encoding ---------------------------------------------------------------------
    def _ln(self, x, w, b, eps=1e-6):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + eps) * w + b

    def _resample(self, p, feats: jax.Array, gh: int, gw: int) -> jax.Array:
        """[L, Wv] tower features -> [query_num, H] (2.6 resampler)."""
        H = self.config.hidden_size
        heads = max(H // 128, 1)
        x = feats @ p['kv_proj_w']                         # [L, H]
        x = self._ln(x, p['ln_kv_w'], p['ln_kv_b'])
        pos = jnp.asarray(sincos_2d(gh, gw, H))
        q = self._ln(p['query'], p['ln_q_w'], p['ln_q_b'])  # [Q, H]
        wq, wk, wv = (p['attn_in_w'][:H], p['attn_in_w'][H:2 * H],
                      p['attn_in_w'][2 * H:])
        bq, bk, bv = (p['attn_in_b'][:H], p['attn_in_b'][H:2 * H],
                      p['attn_in_b'][2 * H:])
        hd = H // heads

        def split(v, n):
            return v.reshape(n, heads, hd).transpose(1, 0, 2)

        Q = self.query_num
        qh = split(q @ wq.T + bq, Q) / math.sqrt(hd)
        kh = split((x + pos) @ wk.T + bk, x.shape[0])
        vh = split(x @ wv.T + bv, x.shape[0])
        att = jnp.einsum('hqd,hkd->hqk', qh, kh)
        att = jax.nn.softmax(att, axis=-1)
        o = jnp.einsum('hqk,hkd->hqd', att, vh)
        o = o.transpose(1, 0, 2).reshape(Q, H)
        o = o @ p['attn_out_w'].T + p['attn_out_b']
        o = self._ln(o, p['ln_post_w'], p['ln_post_b'])
        return o @ p['proj']

    def encode_images_raw(self, vis_params, images
                          ) -> Tuple[List[np.ndarray], List[Tuple]]:
        if self._encode_jit is None:
            self._encode_jit = jax.jit(self.tower.forward_rect)
        feats_out, grids = [], []
        for img in images:
            views = slice_views(img, self.max_slice_nums)
            chunks = []
            for view in views:
                patches, pos_ids, (gh, gw) = self.tower.patches_of(
                    view, self.image_mean, self.image_std)
                f = self._encode_jit(vis_params['tower'],
                                     jnp.asarray(patches),
                                     jnp.asarray(pos_ids))
                chunks.append(np.asarray(
                    self._resample(vis_params, f, gh, gw), np.float32))
            feats_out.append(np.concatenate(chunks, axis=0))
            grids.append((len(views), 1, 1))
        return feats_out, grids


def build_minicpmv26(config: ModelConfig):
    config.attention_bias = True
    model = MiniCPMV26Model(config)
    model._init_vision(config)
    return model
