"""Qwen3-Omni MoE thinker: audio tower + qwen3-vl vision + qwen3-moe LM.

Reference analog: ``lmdeploy/pytorch/models/qwen3_omni_moe_thinker.py``
(925 LoC; the registry maps the full Omni arch to the thinker — module_map.py
"only support thinker module").  The vision side IS the qwen3-vl encoder
(deepstack mergers under ``merger_list``); the LM is qwen3-moe; the new
piece is the AuT audio encoder:

  * mel features split into ``n_window*2``-frame chunks, each run through a
    3-deep stride-2 conv2d stack (gelu) and a ``conv_out`` linear
  * per-chunk sinusoid positions (Whisper layout: [sin | cos])
  * pre-LN encoder layers with BLOCK-DIAGONAL attention over
    ``n_window_infer``-sized windows (cu_seqlens in the reference)
  * ln_post + proj1/gelu/proj2 to the LM hidden size

Audio token count per item: ``((L%100 - 1)//2 + 1`` twice more halved
``+ (L//100)*13`` (reference ``_get_feat_extract_output_lengths``).

Pure-audio prompts use standard sequential positions (TM-RoPE collapses to
the text case when no video frames interleave); image prompts reuse the
qwen3-vl interleaved mrope.
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


def audio_output_lengths(mel_len: int) -> int:
    leave = mel_len % 100
    feat = (leave - 1) // 2 + 1
    return ((feat - 1) // 2 + 1 - 1) // 2 + 1 + (mel_len // 100) * 13


def log_mel_spectrogram(wave: np.ndarray, sr: int = 16000, n_mels: int = 128,
                        n_fft: int = 400, hop: int = 160) -> np.ndarray:
    """Whisper-style log-mel [n_mels, T] from a mono waveform (numpy)."""
    wave = np.asarray(wave, np.float32).reshape(-1)
    pad = n_fft // 2
    x = np.pad(wave, (pad, pad), mode='reflect')
    n_frames = 1 + (len(x) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = x[idx] * np.hanning(n_fft + 1)[:-1]
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2      # [T, n_fft/2+1]
    # mel filterbank (HTK-style slaney-normalized)
    fmax = sr / 2
    mel_pts = np.linspace(0, 2595 * np.log10(1 + fmax / 700), n_mels + 2)
    hz = 700 * (10 ** (mel_pts / 2595) - 1)
    bins = np.fft.rfftfreq(n_fft, 1.0 / sr)
    fb = np.zeros((n_mels, len(bins)), np.float32)
    for m in range(n_mels):
        lo, ce, hi = hz[m], hz[m + 1], hz[m + 2]
        up = (bins - lo) / max(ce - lo, 1e-8)
        dn = (hi - bins) / max(hi - ce, 1e-8)
        fb[m] = np.maximum(0, np.minimum(up, dn)) * (2.0 / (hi - lo))
    mel = spec @ fb.T                                    # [T, n_mels]
    logm = np.log10(np.maximum(mel, 1e-10))
    logm = np.maximum(logm, logm.max() - 8.0)
    return (((logm + 4.0) / 4.0).T[:, :-1]               # drop last frame
            if n_frames > 1 else ((logm + 4.0) / 4.0).T).astype(np.float32)


class AudioTower:
    """Functional AuT encoder; params live in a top-level 'audio' group."""

    def __init__(self, cfg: Dict):
        c = dict(cfg or {})
        self.d = c.get('d_model', 1280)
        self.mel = c.get('num_mel_bins', 128)
        self.max_pos = c.get('max_source_positions', 1500)
        self.layers = c.get('encoder_layers', 32)
        self.heads = c.get('encoder_attention_heads', 20)
        self.ffn = c.get('encoder_ffn_dim', 5120)
        self.down = c.get('downsample_hidden_size', 480)
        self.n_window = c.get('n_window', 50)
        self.n_window_infer = c.get('n_window_infer', 800)
        self.out_dim = c.get('output_dim', 2048)
        self.act_name = c.get('activation_function', 'gelu')
        f = self.mel
        for _ in range(3):
            f = (f + 1) // 2
        self.conv_out_in = self.down * f

    def param_shapes(self) -> Dict[str, Any]:
        d, Ln = self.d, self.layers
        return {
            'conv1_w': (self.down, 1, 3, 3), 'conv1_b': (self.down,),
            'conv2_w': (self.down, self.down, 3, 3), 'conv2_b': (self.down,),
            'conv3_w': (self.down, self.down, 3, 3), 'conv3_b': (self.down,),
            'conv_out_w': (self.conv_out_in, d),
            'qkv_w': (Ln, d, 3 * d), 'qkv_b': (Ln, 3 * d),
            'out_w': (Ln, d, d), 'out_b': (Ln, d),
            'ln1_w': (Ln, d), 'ln1_b': (Ln, d),
            'ln2_w': (Ln, d), 'ln2_b': (Ln, d),
            'fc1_w': (Ln, d, self.ffn), 'fc1_b': (Ln, self.ffn),
            'fc2_w': (Ln, self.ffn, d), 'fc2_b': (Ln, d),
            'ln_post_w': (d,), 'ln_post_b': (d,),
            'proj1_w': (d, d), 'proj1_b': (d,),
            'proj2_w': (d, self.out_dim), 'proj2_b': (self.out_dim,),
        }

    def make_assign_plan(self, prefix: str) -> Dict:
        ident = lambda x: np.asarray(x)  # noqa: E731

        def T(x):
            return np.ascontiguousarray(np.swapaxes(np.asarray(x), -1, -2))

        p = prefix
        plan = {
            p + 'conv2d1.weight': (('audio', 'conv1_w'), ident, None),
            p + 'conv2d1.bias': (('audio', 'conv1_b'), ident, None),
            p + 'conv2d2.weight': (('audio', 'conv2_w'), ident, None),
            p + 'conv2d2.bias': (('audio', 'conv2_b'), ident, None),
            p + 'conv2d3.weight': (('audio', 'conv3_w'), ident, None),
            p + 'conv2d3.bias': (('audio', 'conv3_b'), ident, None),
            p + 'conv_out.weight': (('audio', 'conv_out_w'), T, None),
            p + 'ln_post.weight': (('audio', 'ln_post_w'), ident, None),
            p + 'ln_post.bias': (('audio', 'ln_post_b'), ident, None),
            p + 'proj1.weight': (('audio', 'proj1_w'), T, None),
            p + 'proj1.bias': (('audio', 'proj1_b'), ident, None),
            p + 'proj2.weight': (('audio', 'proj2_w'), T, None),
            p + 'proj2.bias': (('audio', 'proj2_b'), ident, None),
        }
        for li in range(self.layers):
            b = p + f'layers.{li}.'
            plan[b + 'self_attn.qkv_proj.weight'] = \
                (('audio', 'qkv_w', li), T, None)
            plan[b + 'self_attn.qkv_proj.bias'] = \
                (('audio', 'qkv_b', li), ident, None)
            plan[b + 'self_attn.out_proj.weight'] = \
                (('audio', 'out_w', li), T, None)
            plan[b + 'self_attn.out_proj.bias'] = \
                (('audio', 'out_b', li), ident, None)
            plan[b + 'self_attn_layer_norm.weight'] = \
                (('audio', 'ln1_w', li), ident, None)
            plan[b + 'self_attn_layer_norm.bias'] = \
                (('audio', 'ln1_b', li), ident, None)
            plan[b + 'final_layer_norm.weight'] = \
                (('audio', 'ln2_w', li), ident, None)
            plan[b + 'final_layer_norm.bias'] = \
                (('audio', 'ln2_b', li), ident, None)
            plan[b + 'fc1.weight'] = (('audio', 'fc1_w', li), T, None)
            plan[b + 'fc1.bias'] = (('audio', 'fc1_b', li), ident, None)
            plan[b + 'fc2.weight'] = (('audio', 'fc2_w', li), T, None)
            plan[b + 'fc2.bias'] = (('audio', 'fc2_b', li), ident, None)
        return plan

    # -- forward ----------------------------------------------------------------------
    def _ln(self, x, w, b, eps=1e-5):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + eps) * w + b

    def _act(self, x):
        return jax.nn.gelu(x, approximate=False)

    def _sinusoid(self, length: int) -> np.ndarray:
        half = self.d // 2
        inc = math.log(10000) / (half - 1)
        inv = np.exp(-inc * np.arange(half, dtype=np.float32))
        t = np.arange(length, dtype=np.float32)[:, None] * inv[None]
        return np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(
            np.float32)

    def encode(self, p, mel: np.ndarray) -> jax.Array:
        """One audio item: mel [n_mels, T] -> [n_tokens, out_dim].

        Host orchestration (chunk splitting, masks) + jitted chunk stack.
        """
        T = mel.shape[1]
        win = self.n_window * 2
        n_chunks = int(np.ceil(T / win))
        pad_T = n_chunks * win
        mel_p = np.pad(np.asarray(mel, np.float32), ((0, 0), (0, pad_T - T)))
        chunks = mel_p.T.reshape(n_chunks, win, self.mel).transpose(0, 2, 1)
        chunk_lens = np.full(n_chunks, win, np.int64)
        if T % win:
            chunk_lens[-1] = T % win
        x = jnp.asarray(chunks)[:, None]                  # [B, 1, mel, win]
        for wk, bk in (('conv1', 'conv1'), ('conv2', 'conv2'),
                       ('conv3', 'conv3')):
            x = jax.lax.conv_general_dilated(
                x, p[wk + '_w'], (2, 2), [(1, 1), (1, 1)],
                dimension_numbers=('NCHW', 'OIHW', 'NCHW'))
            x = self._act(x + p[bk + '_b'][None, :, None, None])
        b, c, f, t = x.shape
        x = x.transpose(0, 3, 1, 2).reshape(b, t, c * f) @ p['conv_out_w']
        x = x + jnp.asarray(self._sinusoid(t))[None]
        # valid rows per chunk after the three stride-2 convs (ceil-half x3)
        def ceil_half(v):
            return (v - 1) // 2 + 1

        lens_cnn = np.asarray([ceil_half(ceil_half(ceil_half(int(v))))
                               for v in chunk_lens])
        valid = np.zeros((b, t), bool)
        for i, v in enumerate(lens_cnn):
            valid[i, :v] = True
        flat = x.reshape(b * t, self.d)[np.flatnonzero(valid.reshape(-1))]
        L = flat.shape[0]
        # block-diagonal windows: window_aftercnn tokens each
        window = t * max(self.n_window_infer // win, 1)
        blk = np.arange(L) // window
        mask = (blk[:, None] == blk[None, :])
        y = self._layers_jit(p, flat, jnp.asarray(mask))
        return y

    def _layers(self, p, x: jax.Array, mask: jax.Array) -> jax.Array:
        heads, d = self.heads, self.d
        hd = d // heads
        L = x.shape[0]
        for li in range(self.layers):
            r = x
            h = self._ln(x, p['ln1_w'][li], p['ln1_b'][li])
            qkv = h @ p['qkv_w'][li] + p['qkv_b'][li]
            q, k, v = jnp.split(qkv, 3, axis=-1)

            def sp(t):
                return t.reshape(L, heads, hd).transpose(1, 0, 2)

            a = jnp.einsum('hqd,hkd->hqk', sp(q), sp(k)) / math.sqrt(hd)
            a = jnp.where(mask[None], a, -1e30)
            a = jax.nn.softmax(a, axis=-1)
            o = jnp.einsum('hqk,hkd->hqd', a, sp(v))
            o = o.transpose(1, 0, 2).reshape(L, d)
            x = r + (o @ p['out_w'][li] + p['out_b'][li])
            r = x
            h = self._ln(x, p['ln2_w'][li], p['ln2_b'][li])
            h = self._act(h @ p['fc1_w'][li] + p['fc1_b'][li]) \
                @ p['fc2_w'][li] + p['fc2_b'][li]
            x = r + h
        x = self._ln(x, p['ln_post_w'], p['ln_post_b'])
        x = self._act(x @ p['proj1_w'] + p['proj1_b'])
        return x @ p['proj2_w'] + p['proj2_b']

    def _layers_jit(self, p, x, mask):
        if not hasattr(self, '_jit'):
            self._jit = jax.jit(self._layers)
        return self._jit(p, x, mask)


class _OmniMixin(_Qwen3VLMixin):
    """Thinker surface: qwen3-vl vision + AuT audio."""

    audio_marker = '<|audio_pad|>'

    def _init_vision(self, config: ModelConfig):
        super()._init_vision(config)
        vis = config.vision or {}
        hf = config.hf_config or {}
        ac = vis.get('audio_config') or hf.get('audio_config') or {}
        self.audio_tower = AudioTower(ac)
        self.audio_token_index = (hf.get('audio_token_id')
                                  or vis.get('audio_token_id'))

    def param_shapes(self):
        shapes = super().param_shapes()
        shapes['audio'] = self.audio_tower.param_shapes()
        return shapes

    def make_assign_plan(self):
        plan = super().make_assign_plan()
        plan.update(self.audio_tower.make_assign_plan('audio_tower.'))
        # omni checkpoints nest everything under `thinker.`
        plan.update({'thinker.' + k: v for k, v in list(plan.items())})
        return plan

    def vis_assign_plan(self):
        plan = super().vis_assign_plan()
        # omni names the deepstack mergers `merger_list` and nests everything
        # under `thinker.visual.`
        extra = {}
        for k, v in plan.items():
            extra[k.replace('deepstack_merger_list', 'merger_list')] = v
            extra['thinker.' + k] = v
            extra['thinker.' + k.replace('deepstack_merger_list',
                                         'merger_list')] = v
        plan.update(extra)
        return plan

    def encode_audio_raw(self, params, items: List[Dict]) -> List[np.ndarray]:
        out = []
        for item in items:
            data = np.asarray(item['data'], np.float32)
            if data.ndim == 1:                    # raw waveform -> log-mel
                data = log_mel_spectrogram(
                    data, sr=int(item.get('sampling_rate') or 16000),
                    n_mels=self.audio_tower.mel)
            feats = self.audio_tower.encode(params['audio'], data)
            # row count == sum of per-chunk conv lengths; equals
            # audio_output_lengths(T) at the shipped n_window=50 geometry
            out.append(np.asarray(feats, np.float32))
        return out


def build_qwen3_omni(config: ModelConfig):
    config.qk_norm = True
    cls = type('Qwen3OmniThinkerModel', (_OmniMixin, MixtralModel), {})
    model = cls(config)
    model._init_vision(config)
    return model
