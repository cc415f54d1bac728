"""E2E: sliding-window model (mistral-style uniform window) through the
paged engine matches a windowed dense reference, with out-of-window KV
blocks actually freed mid-generation.

This is the correctness gate for the window block manager: freed (and
possibly reused) pages behind the placeholder entries must contribute
nothing — windowed attention masks by absolute position.
"""
import json
import os

import numpy as np
import pytest

WINDOW = 48


@pytest.fixture(scope='module')
def tiny_window_model_dir(tmp_path_factory):
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from conftest import TINY_CFG, make_tiny_tokenizer
    from safetensors.numpy import save_file

    path = tmp_path_factory.mktemp('tiny_mistral')
    cfg = dict(TINY_CFG)
    cfg['architectures'] = ['MistralForCausalLM']
    cfg['model_type'] = 'mistral'
    cfg['sliding_window'] = WINDOW
    with open(path / 'config.json', 'w') as f:
        json.dump(cfg, f)
    make_tiny_tokenizer(str(path))

    rng = np.random.RandomState(7)
    H, I, V = cfg['hidden_size'], cfg['intermediate_size'], cfg['vocab_size']
    nh, nkv, hd = (cfg['num_attention_heads'], cfg['num_key_value_heads'],
                   cfg['head_dim'])
    tensors = {
        'model.embed_tokens.weight': rng.randn(V, H) * 0.02,
        'model.norm.weight': np.ones(H),
        'lm_head.weight': rng.randn(V, H) * 0.02,
    }
    for layer in range(cfg['num_hidden_layers']):
        p = f'model.layers.{layer}.'
        tensors.update({
            p + 'input_layernorm.weight': np.ones(H),
            p + 'post_attention_layernorm.weight': np.ones(H),
            p + 'self_attn.q_proj.weight': rng.randn(nh * hd, H) * 0.02,
            p + 'self_attn.k_proj.weight': rng.randn(nkv * hd, H) * 0.02,
            p + 'self_attn.v_proj.weight': rng.randn(nkv * hd, H) * 0.02,
            p + 'self_attn.o_proj.weight': rng.randn(H, nh * hd) * 0.02,
            p + 'mlp.gate_proj.weight': rng.randn(I, H) * 0.02,
            p + 'mlp.up_proj.weight': rng.randn(I, H) * 0.02,
            p + 'mlp.down_proj.weight': rng.randn(H, I) * 0.02,
        })
    tensors = {k: np.ascontiguousarray(v.astype(np.float32))
               for k, v in tensors.items()}
    save_file(tensors, str(path / 'model.safetensors'))
    return str(path)


def windowed_dense_greedy(params, cfg, prompt_ids, num_new, window):
    """Full-context greedy decode with a sliding-window causal mask."""
    from test_engine_e2e import dense_reference_greedy  # reuse machinery? no — inline

    from lmdeploy_tpu.nn.layers import make_rope_table
    p = {k: np.asarray(v) if not isinstance(v, dict)
         else {k2: np.asarray(v2) for k2, v2 in v.items()}
         for k, v in params.items()}
    H, D = cfg.hidden_size, cfg.head_dim
    Hq, Hkv = cfg.num_attention_heads, cfg.num_key_value_heads
    G = Hq // Hkv
    cos_t, sin_t = np.asarray(make_rope_table(D, 512, cfg.rope_theta)[0]), \
        np.asarray(make_rope_table(D, 512, cfg.rope_theta)[1])

    def rmsnorm(x, w):
        return x / np.sqrt((x * x).mean(-1, keepdims=True)
                           + cfg.rms_norm_eps) * w

    def rope(x, pos):
        c, s = cos_t[pos][:, None, :], sin_t[pos][:, None, :]
        d2 = D // 2
        x1, x2 = x[..., :d2], x[..., d2:]
        return np.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], -1)

    ids = list(prompt_ids)
    for _ in range(num_new):
        S = len(ids)
        pos = np.arange(S)
        h = p['embed'][np.asarray(ids)]
        for layer in range(cfg.num_layers):
            lw = {k: v[layer] for k, v in p['layers'].items()}
            x = rmsnorm(h, lw['attn_norm'])
            q = (x @ lw['wq']).reshape(S, Hq, D)
            k = (x @ lw['wk']).reshape(S, Hkv, D)
            v = (x @ lw['wv']).reshape(S, Hkv, D)
            q, k = rope(q, pos), rope(k, pos)
            kr = np.repeat(k, G, axis=1)
            vr = np.repeat(v, G, axis=1)
            scores = np.einsum('shd,thd->hst', q, kr) / np.sqrt(D)
            causal = pos[None, :] <= pos[:, None]
            in_window = pos[None, :] > pos[:, None] - window
            mask = causal & in_window
            scores = np.where(mask[None], scores, -1e30)
            probs = np.exp(scores - scores.max(-1, keepdims=True))
            probs /= probs.sum(-1, keepdims=True)
            attn = np.einsum('hst,thd->shd', probs, vr).reshape(S, Hq * D)
            h = h + attn @ lw['wo']
            x = rmsnorm(h, lw['mlp_norm'])
            act = (x @ lw['w_gate'])
            act = act / (1 + np.exp(-act)) * (x @ lw['w_up'])
            h = h + act @ lw['w_down']
        h = rmsnorm(h, p['final_norm'])
        logits = h[-1] @ p['lm_head']
        ids.append(int(np.argmax(logits)))
    return ids[len(prompt_ids):]


def test_windowed_engine_matches_dense_and_frees_blocks(tiny_window_model_dir):
    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import TpuEngineConfig
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_engine_e2e import generate_ids

    cfg = TpuEngineConfig(dtype='float32', block_size=16, num_gpu_blocks=64,
                          max_batch_size=8, session_len=256,
                          max_prefill_token_num=64)
    eng = Engine.from_pretrained(tiny_window_model_dir, cfg)
    try:
        assert eng.scheduler.window_size == WINDOW
        rng = np.random.RandomState(11)
        prompt = rng.randint(3, 250, size=40).tolist()
        num_new = 40                       # 80 total >> window 48: blocks die
        got = generate_ids(eng, 1, prompt, max_new=num_new)
        ref = windowed_dense_greedy(eng.model_agent.host_params(),
                                    eng.model_agent.model_config,
                                    prompt, num_new, WINDOW)
        assert list(got.token_ids) == ref
        # leading blocks must actually have been freed mid-generation:
        # 80 tokens, window 48, block 16 -> (80-48+1)//16 = 2 dead blocks/seq
        assert eng.scheduler.num_window_freed_blocks >= 2
    finally:
        eng.close()
