"""InternS1-Pro / InternS1.1: Qwen3-VL vision + Qwen3-MoE text + time series.

Reference analog: ``lmdeploy/pytorch/models/interns1_pro.py`` (433 LoC — the
composition) and ``interns1_pro_time_series.py`` (300 LoC — the tower).  The
LM is a stock Qwen3-MoE (plain rope, NO mrope — the reference forward takes
flat position_ids) and the vision encoder is the Qwen3-VL tower without
deepstack taps, so both reuse this repo's existing implementations; what is
new here is the TIME_SERIES modality:

  host side   per-signal adaptive patching — ``stride = floor(160 /
              (1+exp(-sr/100))^6)``, patch = 2*stride — normalization and
              padding (reference vl/model/interns1_pro.py time_series_processor)
  device side ``ts_encode``: patch embedder (conv1d k5 + fixed sinusoid pos
              enc + one post-norm transformer layer, mean-pooled over patch
              length and channels), even/odd concat subsampling, a
              Whisper-style pre-LN encoder (adapt_in -> conv k3 + conv k3 s2
              -> causal-masked layers), and the LN-MLP projector

Token count per signal: ``(L//2 + 1) // 2`` where L = number of patches —
the //2 from concat subsampling, the ceil-half from the stride-2 conv.
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from .mixtral import MixtralModel
from .qwen3_vl import _Qwen3VLMixin


def ts_patch(signal: np.ndarray, sr: float) -> Tuple[np.ndarray, int]:
    """Host-side adaptive patching: [T, C] -> ([L, patch, C], n_tokens)."""
    sig = np.asarray(signal, np.float32)
    if sig.ndim == 1:
        sig = sig[:, None]
    mean = sig.mean(axis=0, keepdims=True)
    std = sig.std(axis=0, keepdims=True)
    sig = (sig - mean) / (std + 1e-8)
    sig = sig[:240000]
    T = sig.shape[0]
    if sr is None or sr <= 0:
        sr = max(T / 4, 1.0)
    stride = int(np.floor(160.0 / ((1.0 + np.exp(-sr / 100.0)) ** 6)))
    patch = stride * 2
    L = int(np.ceil((T - patch) / stride) + 1)
    pad = (L - 1) * stride + patch - T
    sig = np.pad(sig, ((0, max(pad, 0)), (0, 0)))
    idx = (np.arange(L)[:, None] * stride + np.arange(patch)[None, :])
    patched = sig[idx]                                  # [L, patch, C]
    n_tokens = (L // 2 + 1) // 2
    return patched, n_tokens


def _sin_pos(max_len: int, d: int) -> np.ndarray:
    pe = np.zeros((max_len, d), np.float32)
    pos = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d, 2, dtype=np.float32)
                 * (-math.log(10000.0) / d))
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


class TimeSeriesTower:
    """Functional TS tower; params are a flat dict (top-level 'ts' group)."""

    def __init__(self, ts_cfg: Dict):
        c = dict(ts_cfg or {})
        self.d_model = c.get('d_model', 256)
        self.mel = c.get('num_mel_bins', 80)
        self.max_pos = c.get('max_source_positions', 1500)
        self.scale_embed = c.get('scale_embedding', False)
        self.layers = c.get('encoder_layers', 2)
        self.heads = c.get('encoder_attention_heads', 4)
        self.ffn = c.get('encoder_ffn_dim', 1024)
        self.act = c.get('activation_function', 'gelu')
        self.adapt_in = c.get('ts_adapt_in_dim', 256)
        self.adapt_out = c.get('ts_adapt_out_dim', c.get('ts_hidden_dim', 1024))
        self.hidden = c.get('ts_hidden_dim', self.adapt_out)
        self.out_hidden = c.get('out_hidden_size', 1024)
        self.proj_act = c.get('activation_function', 'gelu')
        # patch embedder (reference MultiChannelAdaptiveSubsampling defaults)
        self.pe_dim = 128
        self.pe_heads = 8
        self.pe_ffn = 2048

    def param_shapes(self) -> Dict[str, Any]:
        d, pd = self.d_model, self.pe_dim
        shapes = {
            # patch embedder
            'pe_conv_w': (pd, 1, 5), 'pe_conv_b': (pd,),
            'pe_in_w': (3 * pd, pd), 'pe_in_b': (3 * pd,),
            'pe_out_w': (pd, pd), 'pe_out_b': (pd,),
            'pe_l1_w': (self.pe_ffn, pd), 'pe_l1_b': (self.pe_ffn,),
            'pe_l2_w': (pd, self.pe_ffn), 'pe_l2_b': (pd,),
            'pe_n1_w': (pd,), 'pe_n1_b': (pd,),
            'pe_n2_w': (pd,), 'pe_n2_b': (pd,),
            # whisper-style encoder
            'adapt_in_w': (self.adapt_in, 80), 'adapt_in_b': (80,),
            'conv1_w': (d, 80, 3), 'conv1_b': (d,),
            'conv2_w': (d, d, 3), 'conv2_b': (d,),
            'pos_embed': (self.max_pos, d),
            'ln_w': (d,), 'ln_b': (d,),
            'adapt_out_w': (d, self.adapt_out), 'adapt_out_b': (self.adapt_out,),
            # per-layer stacks
            'enc_qw': (self.layers, d, d), 'enc_qb': (self.layers, d),
            'enc_kw': (self.layers, d, d), 'enc_kb': (self.layers, d),
            'enc_vw': (self.layers, d, d), 'enc_vb': (self.layers, d),
            'enc_ow': (self.layers, d, d), 'enc_ob': (self.layers, d),
            'enc_n1w': (self.layers, d), 'enc_n1b': (self.layers, d),
            'enc_n2w': (self.layers, d), 'enc_n2b': (self.layers, d),
            'enc_f1w': (self.layers, self.ffn, d), 'enc_f1b': (self.layers, self.ffn),
            'enc_f2w': (self.layers, d, self.ffn), 'enc_f2b': (self.layers, d),
            # projector
            'proj_ln_w': (self.hidden,), 'proj_ln_b': (self.hidden,),
            'proj1_w': (self.hidden, self.out_hidden), 'proj1_b': (self.out_hidden,),
            'proj2_w': (self.out_hidden, self.out_hidden), 'proj2_b': (self.out_hidden,),
        }
        return shapes

    def make_assign_plan(self, prefix: str = 'time_series.') -> Dict:
        def T(x):
            return np.ascontiguousarray(np.swapaxes(np.asarray(x), -1, -2))

        ident = lambda x: np.asarray(x)  # noqa: E731
        p = prefix
        ee = p + 'encoder_embed.'
        tl = ee + 'transformer_encoder.layers.0.'
        en = p + 'encoder.'
        pj = p + 'projector.'
        plan = {
            ee + 'conv.weight': (('ts', 'pe_conv_w'), ident, None),
            ee + 'conv.bias': (('ts', 'pe_conv_b'), ident, None),
            tl + 'self_attn.in_proj_weight': (('ts', 'pe_in_w'), ident, None),
            tl + 'self_attn.in_proj_bias': (('ts', 'pe_in_b'), ident, None),
            tl + 'self_attn.out_proj.weight': (('ts', 'pe_out_w'), ident, None),
            tl + 'self_attn.out_proj.bias': (('ts', 'pe_out_b'), ident, None),
            tl + 'linear1.weight': (('ts', 'pe_l1_w'), ident, None),
            tl + 'linear1.bias': (('ts', 'pe_l1_b'), ident, None),
            tl + 'linear2.weight': (('ts', 'pe_l2_w'), ident, None),
            tl + 'linear2.bias': (('ts', 'pe_l2_b'), ident, None),
            tl + 'norm1.weight': (('ts', 'pe_n1_w'), ident, None),
            tl + 'norm1.bias': (('ts', 'pe_n1_b'), ident, None),
            tl + 'norm2.weight': (('ts', 'pe_n2_w'), ident, None),
            tl + 'norm2.bias': (('ts', 'pe_n2_b'), ident, None),
            en + 'adapt_in.weight': (('ts', 'adapt_in_w'), T, None),
            en + 'adapt_in.bias': (('ts', 'adapt_in_b'), ident, None),
            en + 'conv1.weight': (('ts', 'conv1_w'), ident, None),
            en + 'conv1.bias': (('ts', 'conv1_b'), ident, None),
            en + 'conv2.weight': (('ts', 'conv2_w'), ident, None),
            en + 'conv2.bias': (('ts', 'conv2_b'), ident, None),
            en + 'embed_positions.weight': (('ts', 'pos_embed'), ident, None),
            en + 'layer_norm.weight': (('ts', 'ln_w'), ident, None),
            en + 'layer_norm.bias': (('ts', 'ln_b'), ident, None),
            en + 'adapt_out.weight': (('ts', 'adapt_out_w'), T, None),
            en + 'adapt_out.bias': (('ts', 'adapt_out_b'), ident, None),
            pj + 'layer_norm.weight': (('ts', 'proj_ln_w'), ident, None),
            pj + 'layer_norm.bias': (('ts', 'proj_ln_b'), ident, None),
            pj + 'linear_1.weight': (('ts', 'proj1_w'), T, None),
            pj + 'linear_1.bias': (('ts', 'proj1_b'), ident, None),
            pj + 'linear_2.weight': (('ts', 'proj2_w'), T, None),
            pj + 'linear_2.bias': (('ts', 'proj2_b'), ident, None),
        }
        for name, leaf in [('self_attn.q_proj', 'q'), ('self_attn.k_proj', 'k'),
                           ('self_attn.v_proj', 'v'),
                           ('self_attn.out_proj', 'o')]:
            for li in range(self.layers):
                lp = en + f'layers.{li}.'
                plan[lp + name + '.weight'] = \
                    (('ts', f'enc_{leaf}w', li), ident, None)
                plan[lp + name + '.bias'] = \
                    (('ts', f'enc_{leaf}b', li), ident, None)
        for li in range(self.layers):
            lp = en + f'layers.{li}.'
            plan[lp + 'self_attn_layer_norm.weight'] = \
                (('ts', 'enc_n1w', li), ident, None)
            plan[lp + 'self_attn_layer_norm.bias'] = \
                (('ts', 'enc_n1b', li), ident, None)
            plan[lp + 'final_layer_norm.weight'] = \
                (('ts', 'enc_n2w', li), ident, None)
            plan[lp + 'final_layer_norm.bias'] = \
                (('ts', 'enc_n2b', li), ident, None)
            plan[lp + 'fc1.weight'] = (('ts', 'enc_f1w', li), ident, None)
            plan[lp + 'fc1.bias'] = (('ts', 'enc_f1b', li), ident, None)
            plan[lp + 'fc2.weight'] = (('ts', 'enc_f2w', li), ident, None)
            plan[lp + 'fc2.bias'] = (('ts', 'enc_f2b', li), ident, None)
        return plan

    # -- device forward ---------------------------------------------------------------
    def _act(self, x):
        return jax.nn.gelu(x, approximate=False) if self.act.startswith('gelu') \
            else jax.nn.relu(x)

    def _mha(self, x, wq, bq, wk, bk, wv, bv, wo, bo, heads, causal):
        # x [T, B, D] (torch MHA layout)
        T, B, D = x.shape
        hd = D // heads

        def split(v):
            return v.reshape(T, B, heads, hd).transpose(1, 2, 0, 3)

        q = split(x @ wq.T + bq) / math.sqrt(hd)
        k = split(x @ wk.T + bk)
        v = split(x @ wv.T + bv)
        att = jnp.einsum('bhqd,bhkd->bhqk', q, k)
        if causal:
            mask = jnp.tril(jnp.ones((T, T), bool))
            att = jnp.where(mask[None, None], att, -1e30)
        att = jax.nn.softmax(att, axis=-1)
        o = jnp.einsum('bhqk,bhkd->bhqd', att, v)
        o = o.transpose(2, 0, 1, 3).reshape(T, B, D)
        return o @ wo.T + bo

    def _ln(self, x, w, b, eps=1e-5):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + eps) * w + b

    def patch_embed(self, p, patched: jax.Array) -> jax.Array:
        """[L, patch, C] -> [L, pe_dim] (conv + pos + 1 post-norm layer,
        mean over patch length then channels)."""
        L, P, C = patched.shape
        x = patched.transpose(0, 2, 1).reshape(L * C, 1, P)      # [B*C, 1, P]
        x = jax.lax.conv_general_dilated(
            x, p['pe_conv_w'], (1,), [(2, 2)],
            dimension_numbers=('NCH', 'OIH', 'NCH')) + p['pe_conv_b'][None, :, None]
        x = jax.nn.relu(x)                                       # [B*C, D1, P]
        x = x.transpose(2, 0, 1)                                 # [P, B*C, D1]
        pe = jnp.asarray(_sin_pos(P, self.pe_dim))
        x = x + pe[:, None, :]
        # torch TransformerEncoderLayer, post-norm, relu FFN
        D1 = self.pe_dim
        wq, wk, wv = (p['pe_in_w'][:D1], p['pe_in_w'][D1:2 * D1],
                      p['pe_in_w'][2 * D1:])
        bq, bk, bv = (p['pe_in_b'][:D1], p['pe_in_b'][D1:2 * D1],
                      p['pe_in_b'][2 * D1:])
        a = self._mha(x, wq, bq, wk, bk, wv, bv,
                      p['pe_out_w'], p['pe_out_b'], self.pe_heads,
                      causal=False)
        x = self._ln(x + a, p['pe_n1_w'], p['pe_n1_b'])
        f = jax.nn.relu(x @ p['pe_l1_w'].T + p['pe_l1_b']) @ p['pe_l2_w'].T \
            + p['pe_l2_b']
        x = self._ln(x + f, p['pe_n2_w'], p['pe_n2_b'])
        x = x.mean(0)                                            # [B*C, D1]
        return x.reshape(L, C, D1).mean(1)                       # [L, D1]

    def encode(self, p, patched: jax.Array) -> jax.Array:
        """Full tower: [L, patch, C] -> [n_tokens, out_hidden]."""
        feats = self.patch_embed(p, patched)                     # [L, 128]
        L = feats.shape[0]
        Le = L - (L % 2)
        sub = jnp.concatenate([feats[0:Le:2], feats[1:Le:2]], axis=-1)  # [L//2, 256]
        # whisper-style encoder over one sample
        x = sub[None]                                            # [1, T, 256]
        x = x @ p['adapt_in_w'] + p['adapt_in_b']                # [1, T, 80]
        x = x.transpose(0, 2, 1)                                 # [1, 80, T]
        x = jax.nn.gelu(jax.lax.conv_general_dilated(
            x, p['conv1_w'], (1,), [(1, 1)],
            dimension_numbers=('NCH', 'OIH', 'NCH'))
            + p['conv1_b'][None, :, None], approximate=False)
        x = jax.nn.gelu(jax.lax.conv_general_dilated(
            x, p['conv2_w'], (2,), [(1, 1)],
            dimension_numbers=('NCH', 'OIH', 'NCH'))
            + p['conv2_b'][None, :, None], approximate=False)
        x = x.transpose(0, 2, 1)                                 # [1, T', d]
        Tp = x.shape[1]
        pos = p['pos_embed'][:Tp]
        if Tp > pos.shape[0]:
            pos = jnp.pad(pos, ((0, Tp - pos.shape[0]), (0, 0)))
        x = x + pos[None]
        x = x.transpose(1, 0, 2)                                 # [T', 1, d]
        for li in range(self.layers):
            r = x
            h = self._ln(x, p['enc_n1w'][li], p['enc_n1b'][li])
            h = self._mha(h, p['enc_qw'][li], p['enc_qb'][li],
                          p['enc_kw'][li], p['enc_kb'][li],
                          p['enc_vw'][li], p['enc_vb'][li],
                          p['enc_ow'][li], p['enc_ob'][li],
                          self.heads, causal=True)
            x = r + h
            r = x
            h = self._ln(x, p['enc_n2w'][li], p['enc_n2b'][li])
            h = self._act(h @ p['enc_f1w'][li].T + p['enc_f1b'][li]) \
                @ p['enc_f2w'][li].T + p['enc_f2b'][li]
            x = r + h
        x = self._ln(x, p['ln_w'], p['ln_b'])
        x = x @ p['adapt_out_w'] + p['adapt_out_b']              # [T', 1, dh]
        x = x.transpose(1, 0, 2)[0]                              # [T', dh]
        # projector
        x = self._ln(x, p['proj_ln_w'], p['proj_ln_b'])
        x = self._act(x @ p['proj1_w'] + p['proj1_b'])
        return x @ p['proj2_w'] + p['proj2_b']                   # [T', out]


class _InternS1ProMixin(_Qwen3VLMixin):
    """InternS1-Pro surface: qwen3-vl tower (no deepstack), plain rope,
    optional time-series tower."""

    uses_mrope = False

    def _init_vision(self, config: ModelConfig):
        super()._init_vision(config)
        vis = config.vision or {}
        hf = config.hf_config or {}
        self.ts_tower = None
        ts_cfg = hf.get('ts_config') or vis.get('ts_config')
        if ts_cfg:
            self.ts_tower = TimeSeriesTower(ts_cfg)
        self.ts_marker = '<TS_CONTEXT>'
        self.ts_token_index = hf.get('ts_token_id') or vis.get('ts_token_id')

    def param_shapes(self):
        shapes = super().param_shapes()
        if self.ts_tower is not None:
            shapes['ts'] = self.ts_tower.param_shapes()
        return shapes

    def make_assign_plan(self):
        plan = super().make_assign_plan()
        if self.ts_tower is not None:
            ts = self.ts_tower.make_assign_plan('time_series.')
            plan.update(ts)
            plan.update({'model.' + k: v for k, v in ts.items()})
        return plan

    def encode_time_series_raw(self, params, items: List[Dict]
                               ) -> List[np.ndarray]:
        """Host entry: [{'data': [T,C] array, 'sampling_rate': sr}] ->
        per-item [n_tokens, H] features (jitted per patch geometry)."""
        assert self.ts_tower is not None, 'checkpoint has no ts_config'
        if not hasattr(self, '_ts_jit') or self._ts_jit is None:
            self._ts_jit = jax.jit(self.ts_tower.encode)
        out = []
        for item in items:
            patched, n_tokens = ts_patch(np.asarray(item['data'], np.float32),
                                         item.get('sampling_rate'))
            feats = self._ts_jit(params['ts'], jnp.asarray(patched))
            out.append(np.asarray(feats[:n_tokens], np.float32))
        return out


def build_interns1_pro(config: ModelConfig):
    config.qk_norm = True
    cls = type('InternS1ProModel', (_InternS1ProMixin, MixtralModel), {})
    model = cls(config)
    model._init_vision(config)
    return model
