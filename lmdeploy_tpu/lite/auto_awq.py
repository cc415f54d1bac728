"""AWQ W4A16 offline quantization (JAX, no CUDA).

Reference analog: ``lmdeploy/lite/apis/auto_awq.py:41`` + ``lmdeploy/lite/
quantization/awq.py`` (awq_layers ``:406``, smooth_layers ``:349``, quant_weights
``:306``): activation-aware per-channel scale search folded into the preceding
norm/linear, then group-wise asymmetric int4 quantization, saved as a standard
HF AWQ checkpoint (qweight/qzeros/scales), loadable by this framework and by
any AWQ-compatible runtime.

Scale targets (the GQA-safe subset, matching the reference's default policy):
  * attn_norm  -> wq/wk/wv   (scale folded into the RMSNorm weight)
  * mlp_norm   -> w_gate/w_up
  * w_up       -> w_down     (scale folded into up's output columns)
"""
from __future__ import annotations

import json
import os
import shutil
from typing import Dict, List, Optional

import numpy as np

from .calibrate import ActStats, run_calibration
from .formats import pack_awq_qweight

GRID = [i / 20.0 for i in range(21)]   # alpha search grid, as in AWQ


def _quant_dequant_w4(w: np.ndarray, group_size: int):
    """Group-wise asym int4 quantize + reconstruct; returns (w_hat, q, scales, zeros)."""
    K, N = w.shape
    g = K // group_size
    wg = w.reshape(g, group_size, N).astype(np.float32)
    w_min = wg.min(axis=1)
    w_max = wg.max(axis=1)
    scales = (w_max - w_min) / 15.0
    scales = np.where(scales == 0, 1.0, scales)
    zeros = np.clip(np.round(-w_min / scales), 0, 15)
    q = np.clip(np.round(wg / scales[:, None] + zeros[:, None]), 0, 15)
    w_hat = ((q - zeros[:, None]) * scales[:, None]).reshape(K, N)
    return w_hat, q.reshape(K, N).astype(np.uint8), scales, zeros


def _search_scale(x_sample: np.ndarray, weights: List[np.ndarray], absmean: np.ndarray,
                  group_size: int) -> np.ndarray:
    """AWQ grid search: s = absmean^alpha minimizing quantized-output MSE."""
    x = x_sample.astype(np.float32)
    w_cat = np.concatenate(weights, axis=1)              # [K, sum_N]
    y_ref = x @ w_cat
    best_err, best_s = None, np.ones(w_cat.shape[0], np.float32)
    mean = np.maximum(absmean, 1e-8)
    for alpha in GRID:
        s = mean ** alpha
        s = s / np.sqrt(s.max() * s.min() + 1e-12)       # normalize (AWQ trick)
        s = np.maximum(s, 1e-4)
        w_hat, *_ = _quant_dequant_w4(w_cat * s[:, None], group_size)
        y = (x / s[None, :]) @ w_hat
        err = float(((y - y_ref) ** 2).mean())
        if best_err is None or err < best_err:
            best_err, best_s = err, s
    return best_s


def awq_quantize_params(model, params_np: Dict, stats: Dict[str, ActStats],
                        group_size: int = 128) -> Dict[str, Dict[str, np.ndarray]]:
    """Fold searched scales into params_np IN PLACE; return per-linear quant tensors.

    Returns {'model.layers.{l}.{hf_mod}': {'qweight','qzeros','scales'}} in AWQ
    wire format plus the modified norm weights in params_np.
    """
    cfg = model.config
    out: Dict[str, Dict[str, np.ndarray]] = {}
    lp = params_np['layers']

    def quant_store(hf_name, w):
        _, q, scales, zeros = _quant_dequant_w4(np.asarray(w, np.float32), group_size)
        out[hf_name] = {
            'qweight': pack_awq_qweight(q),
            'qzeros': pack_awq_qweight(zeros.astype(np.uint8)),
            'scales': scales.astype(np.float16),
        }

    moe = 'we_gate' in lp
    for l in range(cfg.num_layers):
        p = f'model.layers.{l}.'
        # 1) attn_norm -> q/k/v
        st = stats[f'layers.{l}.attn_in']
        s = _search_scale(st.sample_matrix(),
                          [lp['wq'][l], lp['wk'][l], lp['wv'][l]],
                          st.absmean, group_size)
        lp['attn_norm'][l] /= s
        for name in ('wq', 'wk', 'wv'):
            lp[name][l] *= s[:, None]
        quant_store(p + 'self_attn.q_proj', lp['wq'][l])
        quant_store(p + 'self_attn.k_proj', lp['wk'][l])
        quant_store(p + 'self_attn.v_proj', lp['wv'][l])
        quant_store(p + 'self_attn.o_proj', lp['wo'][l])

        if moe:
            # MoE block (reference awq.py:406 quantizes each expert on the
            # tokens routed to it).  mlp_norm feeds EVERY expert's gate/up,
            # so one shared scale folds into the norm; per-expert up->down
            # scales fold within each expert.
            st = stats[f'layers.{l}.mlp_in']
            E = lp['we_gate'].shape[1]
            s = _search_scale(
                st.sample_matrix(),
                [np.transpose(lp['we_gate'][l], (1, 0, 2)).reshape(
                     lp['we_gate'].shape[2], -1),
                 np.transpose(lp['we_up'][l], (1, 0, 2)).reshape(
                     lp['we_up'].shape[2], -1)],
                st.absmean, group_size)
            lp['mlp_norm'][l] /= s
            lp['we_gate'][l] *= s[None, :, None]
            lp['we_up'][l] *= s[None, :, None]
            for e in range(E):
                est = stats.get(f'layers.{l}.experts.{e}.down_in')
                if est is not None:
                    se = _search_scale(est.sample_matrix(),
                                       [lp['we_down'][l, e]], est.absmean,
                                       group_size)
                    lp['we_up'][l, e] /= se[None, :]
                    lp['we_down'][l, e] *= se[:, None]
                q = p + f'block_sparse_moe.experts.{e}.'
                quant_store(q + 'w1', lp['we_gate'][l, e])
                quant_store(q + 'w3', lp['we_up'][l, e])
                quant_store(q + 'w2', lp['we_down'][l, e])
            continue

        # 2) mlp_norm -> gate/up
        st = stats[f'layers.{l}.mlp_in']
        s = _search_scale(st.sample_matrix(), [lp['w_gate'][l], lp['w_up'][l]],
                          st.absmean, group_size)
        lp['mlp_norm'][l] /= s
        lp['w_gate'][l] *= s[:, None]
        lp['w_up'][l] *= s[:, None]
        # 3) up -> down
        st = stats[f'layers.{l}.down_in']
        s = _search_scale(st.sample_matrix(), [lp['w_down'][l]], st.absmean,
                          group_size)
        lp['w_up'][l] /= s[None, :]
        lp['w_down'][l] *= s[:, None]

        quant_store(p + 'mlp.gate_proj', lp['w_gate'][l])
        quant_store(p + 'mlp.up_proj', lp['w_up'][l])
        quant_store(p + 'mlp.down_proj', lp['w_down'][l])
    return out


def auto_awq(model_path: str, work_dir: str = './work_dir', w_bits: int = 4,
             w_group_size: int = 128, calib_samples: int = 16,
             calib_seqlen: int = 512, calib_texts: Optional[List[str]] = None,
             device: str = 'cpu'):
    """End-to-end AWQ: calibrate -> scale-fold -> quantize -> save HF checkpoint."""
    assert w_bits == 4, 'only 4-bit AWQ supported'
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
    quant = awq_quantize_params(model, params_np, stats, w_group_size)

    os.makedirs(work_dir, exist_ok=True)
    tensors: Dict[str, np.ndarray] = {}
    for mod, parts in quant.items():
        for part, arr in parts.items():
            tensors[f'{mod}.{part}'] = np.ascontiguousarray(arr)
    # unquantized leftovers: embeddings, norms, lm_head (+ any bias)
    tensors['model.embed_tokens.weight'] = params_np['embed'].astype(np.float16)
    tensors['model.norm.weight'] = params_np['final_norm'].astype(np.float16)
    if 'lm_head' in params_np:
        tensors['lm_head.weight'] = np.ascontiguousarray(
            params_np['lm_head'].T).astype(np.float16)
    lp = params_np['layers']
    for l in range(cfg.num_layers):
        p = f'model.layers.{l}.'
        tensors[p + 'input_layernorm.weight'] = lp['attn_norm'][l].astype(np.float16)
        tensors[p + 'post_attention_layernorm.weight'] = \
            lp['mlp_norm'][l].astype(np.float16)
        if 'router' in lp:      # MoE router stays fp16 ([E, H] HF layout)
            tensors[p + 'block_sparse_moe.gate.weight'] = \
                np.ascontiguousarray(lp['router'][l].T).astype(np.float16)
        for src, hf in (('bq', 'self_attn.q_proj.bias'),
                        ('bk', 'self_attn.k_proj.bias'),
                        ('bv', 'self_attn.v_proj.bias')):
            if src in lp:
                tensors[p + hf] = lp[src][l].astype(np.float16)
    save_file(tensors, os.path.join(work_dir, 'model.safetensors'))

    with open(os.path.join(model_path, 'config.json')) as f:
        hf_cfg = json.load(f)
    hf_cfg['quantization_config'] = {
        'quant_method': 'awq', 'bits': 4, 'group_size': w_group_size,
        'version': 'gemm', 'zero_point': True}
    hf_cfg['torch_dtype'] = 'float16'
    with open(os.path.join(work_dir, 'config.json'), 'w') as f:
        json.dump(hf_cfg, f, indent=2)
    for name in os.listdir(model_path):
        if 'tokenizer' in name or name in ('special_tokens_map.json',
                                           'generation_config.json'):
            shutil.copy(os.path.join(model_path, name), work_dir)
    return work_dir
