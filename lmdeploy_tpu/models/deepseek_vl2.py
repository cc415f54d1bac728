"""DeepSeek-VL2: timm-SigLIP tower + downsample projector + DeepSeek-V2 LM.

Reference analog: ``lmdeploy/pytorch/models/deepseek_vl2.py`` (459 LoC):
timm ``vit_so400m_patch14_siglip_384`` features, ``downsample_mlp_gelu``
projector (2x2 token concat + GELU MLP), and the 2D tile layout — global
view rows each followed by ``image_newline``, a ``view_seperator`` (the
checkpoint keeps the typo), then the local tile grid rows with newlines;
``global_view_pos`` orders the halves.  The LM is the repo's DeepSeek-V2
(MLA) stack under the ``language.`` checkpoint prefix.

Tiling: best (w_tiles, h_tiles) from ``candidate_resolutions`` by maximum
effective resolution then minimum waste (the llava-next rule the official
processor uses); each tile and the global view are 384x384.

Per-image tokens: ``h*(w+1) + 1 + th*h*(tw*w + 1)`` with h = w =
ceil(27/2) = 14 after the 2x2 downsample.
"""
from __future__ import annotations

import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from .deepseek import DeepseekV2Model
from .vision import SiglipVisionTower

SIG_MEAN = (0.5, 0.5, 0.5)
SIG_STD = (0.5, 0.5, 0.5)


def best_tile_grid(w: int, h: int, candidates: List[Tuple[int, int]],
                   tile: int = 384) -> Tuple[int, int]:
    """(w_tiles, h_tiles) maximizing effective resolution, then min waste."""
    best = (1, 1)
    best_eff, best_waste = -1, float('inf')
    for cw, ch in candidates:
        scale = min(cw / w, ch / h)
        eff = min(int(w * scale) * int(h * scale), w * h)
        waste = cw * ch - eff
        if eff > best_eff or (eff == best_eff and waste < best_waste):
            best, best_eff, best_waste = (cw // tile, ch // tile), eff, waste
    return max(best[0], 1), max(best[1], 1)


def tile_views(img, candidates, tile: int = 384
               ) -> Tuple[np.ndarray, Tuple[int, int]]:
    """PIL image -> (views [1 + tw*th, tile, tile, 3] normalized,
    (tw, th)); view 0 is the global square resize."""
    from ..vl.processor import load_image
    img = load_image(img).convert('RGB')
    w, h = img.size
    tw, th = best_tile_grid(w, h, candidates or [(tile, tile)], tile)

    def norm(x):
        return ((x / 255.0 - np.asarray(SIG_MEAN)) / np.asarray(SIG_STD)
                ).astype(np.float32)

    views = [norm(np.asarray(img.resize((tile, tile)), np.float32))]
    grid_img = norm(np.asarray(img.resize((tile * tw, tile * th)),
                               np.float32))
    for r in range(th):
        for c in range(tw):
            views.append(grid_img[r * tile:(r + 1) * tile,
                                  c * tile:(c + 1) * tile])
    return np.stack(views), (tw, th)


class DeepseekVL2Model(DeepseekV2Model):
    """DeepseekVLV2ForCausalLM."""

    image_marker = '<image>'

    def make_assign_plan(self):
        base = super().make_assign_plan()
        plan = dict(base)
        for k, v in base.items():
            plan['language.' + k] = v
        return plan

    # -- vision -----------------------------------------------------------------------
    def _init_vision(self, config: ModelConfig):
        vis = config.vision or {}
        hf = config.hf_config or {}
        vc = dict(vis.get('vision_config') or {})
        vc.setdefault('hidden_act', 'gelu')      # timm ViT uses exact GELU
        self.tower = SiglipVisionTower(vc)
        pc = vis.get('projector_config') or hf.get('projector_config') or {}
        self.proj_depth = pc.get('depth', 2)
        self.n_embed = pc.get('n_embed', self.config.hidden_size)
        self.proj_input = pc.get('input_dim', self.tower.width)
        self.downsample = pc.get('downsample_ratio', 2)
        self.mlp_ratio = pc.get('mlp_ratio', 1)
        self.global_view_pos = (vis.get('global_view_pos')
                                or hf.get('global_view_pos') or 'head')
        self.candidates = [tuple(c) for c in
                           (vis.get('candidate_resolutions')
                            or hf.get('candidate_resolutions') or [])]
        self.image_token_index = hf.get('image_token_id') \
            or vis.get('image_token_index')
        self._encode_jit = None

    def vis_param_shapes(self) -> Dict:
        D, r = self.n_embed, self.mlp_ratio
        C4 = self.proj_input * self.downsample ** 2
        shapes = {
            'tower': self.tower.param_shapes(),
            'image_newline': (D,),
            'view_seperator': (D,),
            'proj0_w': (C4, D * r), 'proj0_b': (D * r,),
        }
        for i in range(1, self.proj_depth):
            last = i == self.proj_depth - 1
            shapes[f'proj{i}_w'] = (D * r, D if last else D * r)
            shapes[f'proj{i}_b'] = (D if last else D * r,)
        return shapes

    def init_vis_params(self, dtype=jnp.float32):
        rng = np.random.RandomState(0)

        def walk(tree):
            out = {}
            for k, v in tree.items():
                out[k] = walk(v) if isinstance(v, dict) else jnp.asarray(
                    rng.randn(*v).astype(np.float32) * 0.02, dtype)
            return out

        shapes = self.vis_param_shapes()
        out = walk({k: v for k, v in shapes.items() if k != 'tower'})
        out['tower'] = self.tower.init_params(dtype=dtype)
        return out

    def vis_assign_plan(self):
        """timm naming: vision.patch_embed.proj, vision.pos_embed,
        vision.blocks.{i}.(norm1|attn.qkv|attn.proj|norm2|mlp.fc1|mlp.fc2),
        vision.norm; projector.layers.{0,2,...}; top-level image_newline /
        view_seperator."""
        P, W, Ln = self.tower.patch_size, self.tower.width, self.tower.num_layers
        ident = lambda x: np.asarray(x)  # noqa: E731

        def T(x):
            return np.ascontiguousarray(np.swapaxes(np.asarray(x), -1, -2))

        def conv_to_mat(x):  # [W, 3, P, P] -> [P*P*3, W]
            return np.ascontiguousarray(
                np.transpose(np.asarray(x), (2, 3, 1, 0)).reshape(P * P * 3, W))

        def qkv_part(i):
            def f(x):                     # [3W, W] fused -> part i transposed
                return T(np.asarray(x)[i * W:(i + 1) * W])
            return f

        def qkv_bias(i):
            return lambda x: np.asarray(x)[i * W:(i + 1) * W]

        def squeeze0(x):                  # [1, N, W] -> [N, W]
            return np.asarray(x).reshape(-1, W)

        plan = {
            'vision.patch_embed.proj.weight': (('tower', 'patch_embed'),
                                               conv_to_mat, None),
            'vision.patch_embed.proj.bias': (('tower', 'patch_embed_b'),
                                             ident, None),
            'vision.pos_embed': (('tower', 'pos_embed'), squeeze0, None),
            'vision.norm.weight': (('tower', 'post_ln_w'), ident, None),
            'vision.norm.bias': (('tower', 'post_ln_b'), ident, None),
            'image_newline': (('image_newline',), ident, None),
            'view_seperator': (('view_seperator',), ident, None),
        }
        for li in range(Ln):
            b = f'vision.blocks.{li}.'
            plan[b + 'norm1.weight'] = (('tower', 'layers', 'ln1_w', li), ident, None)
            plan[b + 'norm1.bias'] = (('tower', 'layers', 'ln1_b', li), ident, None)
            plan[b + 'norm2.weight'] = (('tower', 'layers', 'ln2_w', li), ident, None)
            plan[b + 'norm2.bias'] = (('tower', 'layers', 'ln2_b', li), ident, None)
            plan[b + 'attn.qkv.weight'] = [
                (('tower', 'layers', 'wq', li), qkv_part(0), None),
                (('tower', 'layers', 'wk', li), qkv_part(1), None),
                (('tower', 'layers', 'wv', li), qkv_part(2), None),
            ]
            plan[b + 'attn.qkv.bias'] = [
                (('tower', 'layers', 'bq', li), qkv_bias(0), None),
                (('tower', 'layers', 'bk', li), qkv_bias(1), None),
                (('tower', 'layers', 'bv', li), qkv_bias(2), None),
            ]
            plan[b + 'attn.proj.weight'] = (('tower', 'layers', 'wo', li), T, None)
            plan[b + 'attn.proj.bias'] = (('tower', 'layers', 'bo', li), ident, None)
            plan[b + 'mlp.fc1.weight'] = (('tower', 'layers', 'fc1', li), T, None)
            plan[b + 'mlp.fc1.bias'] = (('tower', 'layers', 'b1', li), ident, None)
            plan[b + 'mlp.fc2.weight'] = (('tower', 'layers', 'fc2', li), T, None)
            plan[b + 'mlp.fc2.bias'] = (('tower', 'layers', 'b2', li), ident, None)
        for i in range(self.proj_depth):
            idx = 0 if i == 0 else 2 * i       # Sequential: Linear,GELU,Linear...
            plan[f'projector.layers.{idx}.weight'] = ((f'proj{i}_w',), T, None)
            plan[f'projector.layers.{idx}.bias'] = ((f'proj{i}_b',), ident, None)
        return plan

    # -- encoding ---------------------------------------------------------------------
    def _project(self, vis, feats: jax.Array) -> jax.Array:
        """[N, hw, C] tower features -> [N, (h/2)*(w/2), n_embed]."""
        N, hw, C = feats.shape
        g = int(round(math.sqrt(hw)))
        d = self.downsample
        pad = (d - g % d) % d
        x = feats.reshape(N, g, g, C)
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, pad), (0, 0)))
        gp = g + pad
        x = x.reshape(N, gp // d, d, gp // d, d, C)
        # match torch F.unfold channel ordering: [C, d, d] fastest-last
        x = x.transpose(0, 1, 3, 5, 2, 4).reshape(N, (gp // d) ** 2,
                                                  C * d * d)
        for i in range(self.proj_depth):
            if i:
                x = jax.nn.gelu(x, approximate=False)
            x = x @ vis[f'proj{i}_w'] + vis[f'proj{i}_b']
        return x

    def _layout(self, vis, embeds: jax.Array, tw: int, th: int) -> jax.Array:
        """[1 + tw*th, hw, D] projected views -> [T, D] token sequence."""
        n, hw, D = embeds.shape
        h = w = int(round(math.sqrt(hw)))
        nl = vis['image_newline'][None, :]

        def with_newlines(x, rows, cols):        # [rows, cols, D]
            nls = jnp.broadcast_to(nl[None], (rows, 1, D))
            return jnp.concatenate([x, nls], axis=1).reshape(-1, D)

        glb = with_newlines(embeds[0].reshape(h, w, D), h, w)
        loc = embeds[1:].reshape(th, tw, h, w, D).transpose(0, 2, 1, 3, 4)
        loc = loc.reshape(th * h, tw * w, D)
        loc = with_newlines(loc, th * h, tw * w)
        sep = vis['view_seperator'][None, :]
        if self.global_view_pos == 'head':
            return jnp.concatenate([glb, sep, loc], axis=0)
        return jnp.concatenate([loc, sep, glb], axis=0)

    def encode_images_raw(self, vis_params, images
                          ) -> Tuple[List[np.ndarray], List[Tuple]]:
        if self._encode_jit is None:
            self._encode_jit = jax.jit(self.tower.forward)
        feats_out, grids = [], []
        for img in images:
            views, (tw, th) = tile_views(img, self.candidates,
                                         self.tower.image_size)
            f = self._encode_jit(vis_params['tower'], jnp.asarray(views))
            emb = self._project(vis_params, f)
            seq = self._layout(vis_params, emb, tw, th)
            feats_out.append(np.asarray(seq, np.float32))
            grids.append((1 + tw * th, tw, th))
        return feats_out, grids


def build_deepseek_vl2(config: ModelConfig):
    model = DeepseekVL2Model(config)
    model._init_vision(config)
    return model
