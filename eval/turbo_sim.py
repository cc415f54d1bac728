"""TurboQuant k4v2 simulation floor: quant-dequant KV inside a plain bf16
forward, teacher-forced ppl on the gate corpus.

VERDICT r4 weak #3 asked where the engine's kv_turbo ppl (+30.5%) exceeds
the numpy simulation floor (+22.8%): this script IS the (reproducible,
in-tree) simulation, with toggles to walk the sim toward the engine path —
quantize K only / V only, skip the Hadamard rotation, and round the
inputs/outputs to bf16 the way the serving kernels do.

Run:  python eval/turbo_sim.py [k_only|v_only|full|none] [--bf16]
"""
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_default_matmul_precision', 'highest')

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

ASSETS = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'assets')
MODEL = os.path.join(ASSETS, 'pylm-25m')


def sim_roundtrip(x, kind, bf16_io):
    """quant->dequant one [N, H, D] tensor through the turbo codec."""
    from lmdeploy_tpu.ops import kv_quant as kq
    if bf16_io:
        x = x.astype(jnp.bfloat16).astype(jnp.float32)
    r = kq.hadamard_rotate(x)
    if kind == 'k':
        nib, mse, qjl = kq.quantize_rows_turbo_k(r)
        out = kq.dequantize_turbo_k(nib, mse, qjl)
    else:
        code, norm = kq.quantize_rows_turbo_v(r)
        out = kq.dequantize_turbo_v(code, norm)
    out = kq.hadamard_rotate_inv(out)
    if bf16_io:
        out = out.astype(jnp.bfloat16)
    return out.astype(x.dtype)


def main():
    mode = next((a for a in sys.argv[1:] if not a.startswith('-')), 'full')
    bf16_io = '--bf16' in sys.argv

    from lmdeploy_tpu.config import ModelConfig
    from lmdeploy_tpu.models import build_model, llama as llama_mod
    from lmdeploy_tpu.ops.attention import fill_kv_cache as real_fill
    from lmdeploy_tpu.ops.attention import kv_row_width
    from lmdeploy_tpu.nn.layers import make_rope_table
    from lmdeploy_tpu.models.llama import AttnMeta
    from lmdeploy_tpu.tokenizer import Tokenizer
    from lmdeploy_tpu.weight_loader import load_params_np

    cfg = ModelConfig.from_pretrained(MODEL, dtype='float32')
    model = build_model(cfg)
    params = {k: jax.device_put(v) for k, v in _tree_put(
        load_params_np(model, MODEL)).items()}
    tok = Tokenizer(MODEL)

    def sim_fill(kv_cache, k_new, v_new, slot_mapping, layer,
                 page_tables=None):
        if mode in ('full', 'k_only'):
            k_new = sim_roundtrip(k_new, 'k', bf16_io)
        if mode in ('full', 'v_only'):
            v_new = sim_roundtrip(v_new, 'v', bf16_io)
        return real_fill(kv_cache, k_new, v_new, slot_mapping, layer,
                         page_tables)

    llama_mod.fill_kv_cache = sim_fill
    try:
        ppl = _corpus_ppl(model, params, tok, cfg)
    finally:
        llama_mod.fill_kv_cache = real_fill
    print({'mode': mode, 'bf16_io': bf16_io, 'ppl': round(ppl, 4)})


def _tree_put(t):
    return t


def _corpus_ppl(model, params, tok, cfg, max_len=768, n_texts=8):
    from lmdeploy_tpu.ops.attention import kv_row_width
    from lmdeploy_tpu.models.llama import AttnMeta
    from lmdeploy_tpu.nn.layers import make_rope_table

    with open(os.path.join(ASSETS, 'corpus_heldout.txt'), encoding='utf-8') as f:
        corpus = f.read()
    chunk = len(corpus) // n_texts
    texts = [corpus[i * chunk:(i + 1) * chunk][:2400] for i in range(n_texts)]

    cos, sin = make_rope_table(cfg.rope_dim, max_len + 8, cfg.rope_theta,
                               cfg.rope_scaling)
    _, rowp = kv_row_width(cfg.num_key_value_heads, cfg.head_dim)
    bs = 64
    nb = max_len // bs + 2
    nll, count = 0.0, 0
    for text in texts:
        ids = tok.encode(text)[:max_len]
        if len(ids) < 16:
            continue
        T = len(ids)
        kv = jnp.zeros((cfg.num_layers, nb, 2, bs, rowp), jnp.float32)
        meta = AttnMeta(
            block_tables=jnp.arange(1, nb, dtype=jnp.int32)[None],
            history_lens=jnp.zeros((1,), jnp.int32),
            q_lens=jnp.asarray([T], jnp.int32))
        arr = jnp.asarray(np.asarray(ids, np.int32))[None]
        pos = jnp.arange(T, dtype=jnp.int32)[None]
        logits, _ = model.forward(params, arr, pos, kv, meta, cos, sin,
                                  return_all_logits=True,
                                  fresh_prefill=False)
        lp = jax.nn.log_softmax(logits[0].astype(jnp.float32), axis=-1)
        tgt = np.asarray(ids[1:])
        nll -= float(jnp.take_along_axis(
            lp[:-1], jnp.asarray(tgt)[:, None], 1).sum())
        count += len(tgt)
    return math.exp(nll / max(count, 1))


if __name__ == '__main__':
    main()
