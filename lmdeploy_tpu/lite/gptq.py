"""GPTQ W4A16 offline quantization (numpy, no CUDA, no AutoGPTQ dependency).

Reference analog: ``lmdeploy/lite/apis/gptq.py`` (which drives AutoGPTQ's
CUDA path).  This is the actual OBQ/GPTQ algorithm (Frantar et al.): per
linear, accumulate the input Hessian H = sum X^T X during calibration, then
quantize input channels one at a time with error feedback through the
Cholesky factor of H^-1 — each quantized column's rounding error is
propagated into the not-yet-quantized columns so the LAYER OUTPUT error (not
the weight error) is minimized.

Output: a standard HF GPTQ checkpoint (qweight i32[K/8, N] sequential
nibbles, qzeros with the classic z-1 storage, scales f16[K/gs, N]) loadable
by this framework (lite/formats.py gptq_qweight_to_kernel) and by
GPTQ-compatible runtimes.
"""
from __future__ import annotations

import json
import os
import shutil
from typing import Dict, List, Optional

import numpy as np

from .calibrate import run_calibration
from .formats import pack_gptq_qweight, pack_gptq_qzeros


def gptq_quantize_matrix(w_kn: np.ndarray, hessian: np.ndarray,
                         group_size: int = 128, blocksize: int = 128,
                         percdamp: float = 0.01):
    """GPTQ-quantize one weight [K, N] (input-major) given H [K, K].

    Returns (q u8 [K, N], scales f32 [K/gs, N], zeros f32 [K/gs, N])
    with asymmetric per-(input-group, output) params, zeros clamped to
    [1, 15] so the z-1 wire storage roundtrips exactly.
    """
    K, N = w_kn.shape
    assert K % group_size == 0, \
        f'input dim {K} not divisible by group_size {group_size}; pick a ' \
        'w_group_size dividing every projection input width'
    W = np.ascontiguousarray(w_kn.T, dtype=np.float64)        # [N, K]
    H = hessian.astype(np.float64).copy()

    dead = np.diag(H) == 0
    H[dead, dead] = 1.0
    W[:, dead] = 0.0
    damp = percdamp * float(np.mean(np.diag(H)))
    H[np.arange(K), np.arange(K)] += max(damp, 1e-8)
    # upper Cholesky factor of H^-1 (torch: cholesky -> cholesky_inverse ->
    # cholesky(upper)); np equivalent: inv then lower-chol transposed
    Hinv = np.linalg.cholesky(np.linalg.inv(H)).T             # [K, K] upper

    G = K // group_size
    Q = np.zeros((N, K), np.uint8)
    scales = np.zeros((G, N), np.float32)
    zeros = np.zeros((G, N), np.float32)
    sc = zp = None

    bs = max(blocksize, group_size)
    for i1 in range(0, K, bs):
        i2 = min(i1 + bs, K)
        W1 = W[:, i1:i2].copy()
        Q1 = np.zeros_like(W1)
        Err = np.zeros_like(W1)
        Hinv1 = Hinv[i1:i2, i1:i2]
        for j in range(i2 - i1):
            col = i1 + j
            if col % group_size == 0:
                g = col // group_size
                gw = W1[:, j:j + group_size]
                mn = np.minimum(gw.min(axis=1), 0.0)
                mx = np.maximum(gw.max(axis=1), 0.0)
                s = (mx - mn) / 15.0
                s = np.where(s <= 0, 1.0, s)
                z = np.clip(np.round(-mn / s), 1, 15)
                sc, zp = s, z
                scales[g] = s.astype(np.float32)
                zeros[g] = z.astype(np.float32)
            w = W1[:, j]
            d = Hinv1[j, j]
            q = np.clip(np.round(w / sc + zp), 0, 15)
            dq = (q - zp) * sc
            Q1[:, j] = q
            err = (w - dq) / d
            if j + 1 < i2 - i1:
                W1[:, j + 1:] -= np.outer(err, Hinv1[j, j + 1:])
            Err[:, j] = err
        Q[:, i1:i2] = Q1.astype(np.uint8)
        if i2 < K:
            W[:, i2:] -= Err @ Hinv[i1:i2, i2:]
    return np.ascontiguousarray(Q.T), scales, zeros            # q [K, N]


def gptq_quantize_params(model, params_np: Dict, stats: Dict,
                         group_size: int = 128
                         ) -> Dict[str, Dict[str, np.ndarray]]:
    """Per-linear GPTQ over every projection, using each site's calibrated
    input Hessian ('attn_in' for q/k/v, 'o_in' for o, 'mlp_in' for gate/up,
    'down_in' for down)."""
    cfg = model.config
    out: Dict[str, Dict[str, np.ndarray]] = {}
    lp = params_np['layers']
    sites = (('wq', 'self_attn.q_proj', 'attn_in'),
             ('wk', 'self_attn.k_proj', 'attn_in'),
             ('wv', 'self_attn.v_proj', 'attn_in'),
             ('wo', 'self_attn.o_proj', 'o_in'),
             ('w_gate', 'mlp.gate_proj', 'mlp_in'),
             ('w_up', 'mlp.up_proj', 'mlp_in'),
             ('w_down', 'mlp.down_proj', 'down_in'))
    for l in range(cfg.num_layers):
        for src, hf_mod, stat_key in sites:
            H = stats[f'layers.{l}.{stat_key}'].hessian
            q, s, z = gptq_quantize_matrix(
                np.asarray(lp[src][l], np.float32), H, group_size)
            out[f'model.layers.{l}.{hf_mod}'] = {
                'qweight': pack_gptq_qweight(q),
                'qzeros': pack_gptq_qzeros(z.astype(np.uint8)),
                'scales': s.astype(np.float16),
            }
    return out


def auto_gptq(model_path: str, work_dir: str = './work_dir', w_bits: int = 4,
              w_group_size: int = 128, calib_samples: int = 16,
              calib_seqlen: int = 512,
              calib_texts: Optional[List[str]] = None):
    """End-to-end GPTQ: calibrate (with Hessians) -> OBQ quantize -> save a
    standard HF GPTQ checkpoint (reference CLI: lmdeploy lite auto_gptq)."""
    assert w_bits == 4, 'only 4-bit GPTQ supported'
    from safetensors.numpy import save_file

    from ..config import ModelConfig
    from ..models import build_model
    from ..tokenizer import Tokenizer
    from ..weight_loader import load_params_np

    cfg = ModelConfig.from_pretrained(model_path, dtype='float32')
    assert not cfg.quantization_config, 'model is already quantized'
    model = build_model(cfg)
    params_np = load_params_np(model, model_path)
    tokenizer = Tokenizer(model_path)

    stats = run_calibration(model, params_np, tokenizer, calib_texts,
                            calib_samples, calib_seqlen, want_hessian=True)
    quant = gptq_quantize_params(model, params_np, stats, w_group_size)

    os.makedirs(work_dir, exist_ok=True)
    tensors: Dict[str, np.ndarray] = {}
    for mod, parts in quant.items():
        for part, arr in parts.items():
            tensors[f'{mod}.{part}'] = np.ascontiguousarray(arr)
    tensors['model.embed_tokens.weight'] = params_np['embed'].astype(np.float16)
    tensors['model.norm.weight'] = params_np['final_norm'].astype(np.float16)
    if 'lm_head' in params_np:
        tensors['lm_head.weight'] = np.ascontiguousarray(
            params_np['lm_head'].T).astype(np.float16)
    lp = params_np['layers']
    for l in range(cfg.num_layers):
        p = f'model.layers.{l}.'
        tensors[p + 'input_layernorm.weight'] = \
            lp['attn_norm'][l].astype(np.float16)
        tensors[p + 'post_attention_layernorm.weight'] = \
            lp['mlp_norm'][l].astype(np.float16)
        for src, hf in (('bq', 'self_attn.q_proj.bias'),
                        ('bk', 'self_attn.k_proj.bias'),
                        ('bv', 'self_attn.v_proj.bias')):
            if src in lp:
                tensors[p + hf] = lp[src][l].astype(np.float16)
    save_file(tensors, os.path.join(work_dir, 'model.safetensors'))

    with open(os.path.join(model_path, 'config.json')) as f:
        hf_cfg = json.load(f)
    hf_cfg['quantization_config'] = {
        'quant_method': 'gptq', 'bits': 4, 'group_size': w_group_size,
        'desc_act': False, 'sym': False}
    hf_cfg['torch_dtype'] = 'float16'
    with open(os.path.join(work_dir, 'config.json'), 'w') as f:
        json.dump(hf_cfg, f, indent=2)
    for name in os.listdir(model_path):
        if 'tokenizer' in name or name in ('special_tokens_map.json',
                                           'generation_config.json'):
            shutil.copy(os.path.join(model_path, name), work_dir)
    return work_dir
