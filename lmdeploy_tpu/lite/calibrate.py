"""Calibration: per-layer activation statistics for AWQ / SmoothQuant.

Reference analog: ``lmdeploy/lite/quantization/calibration.py`` (CalibrationContext:
hooks per-layer inputs/outputs, collects absmax/absmean) and
``lmdeploy/lite/apis/calibrate.py``.

The torch version hooks nn.Modules; here the model is functional, so calibration
runs its own instrumented forward: a python loop over layers (sliced from the
stacked params) that records, for every linear's input, running mean(|x|) and
max(|x|) per channel plus a bounded sample of activation rows for scale search.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np


@dataclass
class ActStats:
    absmean: Optional[np.ndarray] = None   # [C] running mean of |x|
    absmax: Optional[np.ndarray] = None    # [C] running max of |x|
    samples: List[np.ndarray] = field(default_factory=list)   # few [rows, C] f32
    count: int = 0
    want_hessian: bool = False             # GPTQ: accumulate X^T X
    hessian: Optional[np.ndarray] = None   # [C, C] f64

    def update(self, x: np.ndarray, max_sample_rows: int = 128):
        x2 = x.reshape(-1, x.shape[-1]).astype(np.float32)
        amean = np.abs(x2).mean(0)
        amax = np.abs(x2).max(0)
        n = x2.shape[0]
        if self.absmean is None:
            self.absmean, self.absmax, self.count = amean, amax, n
        else:
            total = self.count + n
            self.absmean = (self.absmean * self.count + amean * n) / total
            self.absmax = np.maximum(self.absmax, amax)
            self.count = total
        if self.want_hessian:
            h = (x2.astype(np.float64).T @ x2.astype(np.float64))
            self.hessian = h if self.hessian is None else self.hessian + h
        if sum(s.shape[0] for s in self.samples) < max_sample_rows:
            self.samples.append(x2[:max_sample_rows])

    def sample_matrix(self) -> np.ndarray:
        return np.concatenate(self.samples, axis=0)


def default_calib_text() -> List[str]:
    """Built-in fallback corpus (the reference pulls wikitext2/c4; offline here)."""
    base = (
        'The quick brown fox jumps over the lazy dog. '
        'In the beginning the universe was created; this has made a lot of people '
        'very angry and been widely regarded as a bad move. '
        'Deep learning models synthesize patterns from large corpora of text, '
        'learning statistical regularities that generalize to unseen inputs. '
        'It was the best of times, it was the worst of times, it was the age of '
        'wisdom, it was the age of foolishness. '
        'A distributed system is one in which the failure of a computer you did '
        'not even know existed can render your own computer unusable. ')
    return [base * 8] * 16


def collect_stats(model, params_np: Dict, input_ids: np.ndarray,
                  stats: Optional[Dict[str, ActStats]] = None,
                  want_hessian: bool = False) -> Dict[str, ActStats]:
    """Instrumented forward over one [T] prompt; updates per-linear input stats.

    Stat keys: 'layers.{l}.attn_in' (wq/wk/wv input), 'layers.{l}.o_in',
    'layers.{l}.mlp_in' (gate/up input), 'layers.{l}.down_in'.
    """
    import jax.numpy as jnp
    from ..nn.layers import apply_rope, make_rope_table, rms_norm

    cfg = model.config
    stats = stats if stats is not None else {}

    def stat(key, x):
        stats.setdefault(key, ActStats(want_hessian=want_hessian)).update(
            np.asarray(x))

    T = len(input_ids)
    D = cfg.head_dim
    cos_t, sin_t = make_rope_table(D, max(T, 128), cfg.rope_theta, cfg.rope_scaling)
    pos = jnp.arange(T)
    cos = jnp.asarray(cos_t)[pos][None]
    sin = jnp.asarray(sin_t)[pos][None]

    h = jnp.asarray(params_np['embed'][np.asarray(input_ids)],
                    jnp.float32)[None]               # [1, T, H]
    lp = params_np['layers']
    for l in range(cfg.num_layers):
        w = {k: v[l] for k, v in lp.items()}
        x = rms_norm(h, jnp.asarray(w['attn_norm'], jnp.float32), cfg.rms_norm_eps)
        stat(f'layers.{l}.attn_in', x)
        q = x @ w['wq']
        k = x @ w['wk']
        v = x @ w['wv']
        B = 1
        q = q.reshape(B, T, cfg.num_attention_heads, D)
        k = k.reshape(B, T, cfg.num_key_value_heads, D)
        v = v.reshape(B, T, cfg.num_key_value_heads, D)
        q, k = apply_rope(q, k, cos, sin)
        G = cfg.num_attention_heads // cfg.num_key_value_heads
        kr = jnp.repeat(k, G, axis=2)
        vr = jnp.repeat(v, G, axis=2)
        scores = jnp.einsum('bthd,bshd->bhts', q, kr) / np.sqrt(D)
        mask = np.tril(np.ones((T, T), bool))
        scores = jnp.where(mask[None, None], scores, -1e30)
        probs = jnp.exp(scores - scores.max(-1, keepdims=True))
        probs = probs / probs.sum(-1, keepdims=True)
        attn = jnp.einsum('bhts,bshd->bthd', probs, vr).reshape(B, T, -1)
        stat(f'layers.{l}.o_in', attn)
        h = h + attn @ w['wo']
        x = rms_norm(h, jnp.asarray(w['mlp_norm'], jnp.float32), cfg.rms_norm_eps)
        stat(f'layers.{l}.mlp_in', x)
        if 'we_gate' in w:
            # sparse-MoE block (mixtral/qwen2-moe geometry): route tokens,
            # collect each expert's down-proj input over the tokens it
            # actually processed (reference: lite/quantization/awq.py:406
            # calibrates experts on their routed subsets)
            xf = np.asarray(x.reshape(T, -1), np.float32)
            logits = xf @ np.asarray(w['router'], np.float32)        # [T, E]
            k = cfg.num_experts_per_tok
            E = logits.shape[-1]
            top_idx = np.argsort(-logits, axis=-1)[:, :k]            # [T, k]
            probs = np.exp(logits - logits.max(-1, keepdims=True))
            probs /= probs.sum(-1, keepdims=True)
            moe_out = np.zeros_like(xf)
            top_p = np.take_along_axis(probs, top_idx, axis=-1)
            if cfg.norm_topk_prob:
                top_p = top_p / np.maximum(top_p.sum(-1, keepdims=True),
                                           1e-9)
            for e in range(E):
                rows = np.nonzero((top_idx == e).any(-1))[0]
                if rows.size == 0:
                    continue
                xe = xf[rows]
                gate = xe @ np.asarray(w['we_gate'][e], np.float32)
                up = xe @ np.asarray(w['we_up'][e], np.float32)
                act = (gate / (1 + np.exp(-gate))) * up
                stat(f'layers.{l}.experts.{e}.down_in', act)
                ye = act @ np.asarray(w['we_down'][e], np.float32)
                wgt = np.where((top_idx[rows] == e), top_p[rows],
                               0.0).sum(-1, keepdims=True)
                moe_out[rows] += wgt * ye
            h = h + jnp.asarray(moe_out.reshape(1, T, -1))
        else:
            gate = x @ w['w_gate']
            up = x @ w['w_up']
            act = (gate / (1 + jnp.exp(-gate))) * up      # silu(gate) * up
            stat(f'layers.{l}.down_in', act)
            h = h + act @ w['w_down']
    return stats


def run_calibration(model, params_np: Dict, tokenizer, texts: Optional[List[str]] = None,
                    calib_samples: int = 16, calib_seqlen: int = 512,
                    want_hessian: bool = False,
                    ) -> Dict[str, ActStats]:
    texts = texts or default_calib_text()
    stats: Dict[str, ActStats] = {}
    n = 0
    for text in texts:
        if n >= calib_samples:
            break
        ids = tokenizer.encode(text)[:calib_seqlen]
        if len(ids) < 8:
            continue
        ids = np.clip(np.asarray(ids, np.int32), 0,
                      params_np['embed'].shape[0] - 1)
        collect_stats(model, params_np, ids, stats,
                      want_hessian=want_hessian)
        n += 1
    return stats
