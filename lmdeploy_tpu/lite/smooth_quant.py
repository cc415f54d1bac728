"""SmoothQuant W8A8 offline quantization (JAX).

Reference analog: ``lmdeploy/lite/apis/smooth_quant.py:18`` — migrate activation
outliers into weights with s = max|x|^a / max|w|^(1-a) (a=0.5), fold s into the
preceding norm/linear, then per-output-channel symmetric int8 weight quantization.
Serving path: nn/linear.py _w8a8 (dynamic per-token activation quant + int8 MXU dot).

Saved format (this framework's native w8a8 checkpoint):
  '{mod}.weight' i8[N, K] (torch orientation), '{mod}.scale' f32[N]
  config.quantization_config = {'quant_method': 'smooth_quant'}
"""
from __future__ import annotations

import json
import os
import shutil
from typing import Dict, List, Optional

import numpy as np

from .calibrate import run_calibration


def _smooth_scale(absmax_x: np.ndarray, w_cat: np.ndarray, alpha: float = 0.5
                  ) -> np.ndarray:
    w_max = np.abs(w_cat).max(axis=1)
    s = (np.maximum(absmax_x, 1e-5) ** alpha) / \
        (np.maximum(w_max, 1e-5) ** (1 - alpha))
    return np.clip(s, 1e-4, 1e4).astype(np.float32)


def _quant_int8(w: np.ndarray):
    """Per-output-channel symmetric int8: returns (w8 [K,N] i8, scale [N] f32)."""
    scale = np.abs(w).max(axis=0) / 127.0
    scale = np.where(scale == 0, 1.0, scale).astype(np.float32)
    w8 = np.clip(np.round(w / scale[None, :]), -127, 127).astype(np.int8)
    return w8, scale


def smooth_quant(model_path: str, work_dir: str = './work_dir',
                 calib_samples: int = 16, calib_seqlen: int = 512,
                 calib_texts: Optional[List[str]] = None, alpha: float = 0.5):
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
                            calib_samples, calib_seqlen)

    lp = params_np['layers']
    tensors: Dict[str, np.ndarray] = {}

    def store(hf_name, w):
        w8, scale = _quant_int8(np.asarray(w, np.float32))
        tensors[f'{hf_name}.weight'] = np.ascontiguousarray(w8.T)  # [N, K] torch-style
        tensors[f'{hf_name}.scale'] = scale

    for l in range(cfg.num_layers):
        p = f'model.layers.{l}.'
        s = _smooth_scale(stats[f'layers.{l}.attn_in'].absmax,
                          np.concatenate([lp['wq'][l], lp['wk'][l], lp['wv'][l]], 1),
                          alpha)
        lp['attn_norm'][l] /= s
        for name in ('wq', 'wk', 'wv'):
            lp[name][l] *= s[:, None]
        s = _smooth_scale(stats[f'layers.{l}.mlp_in'].absmax,
                          np.concatenate([lp['w_gate'][l], lp['w_up'][l]], 1), alpha)
        lp['mlp_norm'][l] /= s
        lp['w_gate'][l] *= s[:, None]
        lp['w_up'][l] *= s[:, None]

        store(p + 'self_attn.q_proj', lp['wq'][l])
        store(p + 'self_attn.k_proj', lp['wk'][l])
        store(p + 'self_attn.v_proj', lp['wv'][l])
        store(p + 'self_attn.o_proj', lp['wo'][l])
        store(p + 'mlp.gate_proj', lp['w_gate'][l])
        store(p + 'mlp.up_proj', lp['w_up'][l])
        store(p + 'mlp.down_proj', lp['w_down'][l])
        tensors[p + 'input_layernorm.weight'] = lp['attn_norm'][l].astype(np.float16)
        tensors[p + 'post_attention_layernorm.weight'] = \
            lp['mlp_norm'][l].astype(np.float16)
        for src, hf in (('bq', 'self_attn.q_proj.bias'),
                        ('bk', 'self_attn.k_proj.bias'),
                        ('bv', 'self_attn.v_proj.bias')):
            if src in lp:
                tensors[p + hf] = lp[src][l].astype(np.float16)

    tensors['model.embed_tokens.weight'] = params_np['embed'].astype(np.float16)
    tensors['model.norm.weight'] = params_np['final_norm'].astype(np.float16)
    if 'lm_head' in params_np:
        tensors['lm_head.weight'] = np.ascontiguousarray(
            params_np['lm_head'].T).astype(np.float16)

    os.makedirs(work_dir, exist_ok=True)
    save_file(tensors, os.path.join(work_dir, 'model.safetensors'))
    with open(os.path.join(model_path, 'config.json')) as f:
        hf_cfg = json.load(f)
    hf_cfg['quantization_config'] = {'quant_method': 'smooth_quant', 'bits': 8}
    hf_cfg['torch_dtype'] = 'float16'
    with open(os.path.join(work_dir, 'config.json'), 'w') as f:
        json.dump(hf_cfg, f, indent=2)
    for name in os.listdir(model_path):
        if 'tokenizer' in name or name in ('special_tokens_map.json',
                                           'generation_config.json'):
            shutil.copy(os.path.join(model_path, name), work_dir)
    return work_dir
