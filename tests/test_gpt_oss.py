"""gpt-oss family: sinks, alternating sliding window, clamped SwiGLU MoE,
MXFP4 dequant — engine vs dense numpy reference."""
import json
import os

import numpy as np
import pytest


GPTOSS_CFG = {
    'architectures': ['GptOssForCausalLM'],
    'model_type': 'gpt_oss',
    'hidden_size': 64,
    'intermediate_size': 96,
    'num_hidden_layers': 2,
    'num_attention_heads': 4,
    'num_key_value_heads': 2,
    'head_dim': 16,
    'vocab_size': 256,
    'max_position_embeddings': 512,
    'rms_norm_eps': 1e-6,
    'rope_theta': 10000.0,
    'num_local_experts': 4,
    'num_experts_per_tok': 2,
    'sliding_window': 32,
    'layer_types': ['sliding_attention', 'full_attention'],
    'swiglu_limit': 7.0,
    'attention_bias': True,
    'eos_token_id': 2,
    'tie_word_embeddings': False,
    'torch_dtype': 'float32',
}


@pytest.fixture(scope='module')
def gptoss_dir(tmp_path_factory):
    from conftest import make_tiny_tokenizer
    d = str(tmp_path_factory.mktemp('gptoss'))
    with open(os.path.join(d, 'config.json'), 'w') as f:
        json.dump(GPTOSS_CFG, f)
    make_tiny_tokenizer(d)
    return d


def _dense_reference(params, cfg, layer_windows, prompt_ids, num_new):
    from lmdeploy_tpu.nn.layers import make_rope_table

    p = {k: np.asarray(v) if not isinstance(v, dict)
         else {k2: np.asarray(v2) for k2, v2 in v.items()}
         for k, v in params.items()}
    H, D = cfg.hidden_size, cfg.head_dim
    Hq, Hkv = cfg.num_attention_heads, cfg.num_key_value_heads
    G = Hq // Hkv
    E, k_top = cfg.num_experts, cfg.num_experts_per_tok
    limit = 7.0
    cos_t, sin_t = make_rope_table(D, 512, cfg.rope_theta)
    cos_t, sin_t = np.asarray(cos_t), np.asarray(sin_t)

    def rmsnorm(x, w):
        return x / np.sqrt((x * x).mean(-1, keepdims=True) + cfg.rms_norm_eps) * w

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
            window = int(layer_windows[layer])
            x = rmsnorm(h, lw['attn_norm'])
            q = (x @ lw['wq'] + lw['bq']).reshape(S, Hq, D)
            kk = (x @ lw['wk'] + lw['bk']).reshape(S, Hkv, D)
            v = (x @ lw['wv'] + lw['bv']).reshape(S, Hkv, D)
            q, kk = rope(q, pos), rope(kk, pos)
            kr = np.repeat(kk, G, axis=1)
            vr = np.repeat(v, G, axis=1)
            scores = np.einsum('shd,thd->hst', q, kr) / np.sqrt(D)
            mask = np.tril(np.ones((S, S), bool))
            if window > 0:
                mask &= (pos[None, :] > pos[:, None] - window)
            scores = np.where(mask[None], scores, -1e30)
            # sinks: per-head logit joins the denominator
            sink = lw['sinks']                                  # [Hq]
            m = np.maximum(scores.max(-1), sink[:, None])       # [Hq, S]
            e = np.exp(scores - m[..., None])
            denom = e.sum(-1) + np.exp(sink[:, None] - m)
            probs = e / denom[..., None]
            attn = np.einsum('hst,thd->shd', probs, vr).reshape(S, Hq * D)
            h = h + attn @ lw['wo'] + lw['bo']
            x = rmsnorm(h, lw['mlp_norm'])
            logits = x @ lw['router'] + lw['router_bias']
            out = np.zeros_like(x)
            for t in range(S):
                idx = np.argsort(-logits[t])[:k_top]
                wts = np.exp(logits[t][idx] - logits[t][idx].max())
                wts = wts / wts.sum()
                for e_i, wt in zip(idx, wts):
                    gate = x[t] @ lw['we_gate'][e_i] + lw['bg'][e_i]
                    up = x[t] @ lw['we_up'][e_i] + lw['bu'][e_i]
                    gate = np.minimum(gate, limit)
                    up = np.clip(up, -limit, limit)
                    glu = gate / (1 + np.exp(-gate * 1.702)) * 1.0
                    act = (up + 1.0) * glu
                    out[t] += wt * (act @ lw['we_down'][e_i] + lw['bd'][e_i])
            h = h + out
        h = rmsnorm(h, p['final_norm'])
        logits = h[-1] @ p['lm_head']
        ids.append(int(np.argmax(logits)))
    return ids[len(prompt_ids):]


def test_gpt_oss_matches_dense_reference(gptoss_dir):
    import asyncio
    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import GenerationConfig, TpuEngineConfig

    cfg = TpuEngineConfig(dtype='float32', block_size=16, num_gpu_blocks=64,
                          max_batch_size=4, session_len=128,
                          max_prefill_token_num=64, empty_init=True)
    eng = Engine.from_pretrained(gptoss_dir, cfg)
    try:
        model = eng.model_agent.model
        assert list(model.layer_windows) == [32, 0]
        prompt = list(range(3, 45))   # long enough to cross the 32 window

        async def run():
            inst = eng.create_instance()
            out = await inst.async_infer(
                1, prompt, GenerationConfig(max_new_tokens=8, ignore_eos=True))
            await inst.async_end(1)
            return list(out.token_ids)

        loop = asyncio.new_event_loop()
        try:
            got = loop.run_until_complete(run())
        finally:
            loop.close()
        expect = _dense_reference(eng.model_agent.host_params(), eng.model_config,
                                  model.layer_windows, prompt, 8)
        assert got == expect
    finally:
        eng.close()


def test_mxfp4_dequant_roundtrip():
    from lmdeploy_tpu.lite.formats import mxfp4_dequant

    rng = np.random.RandomState(0)
    G = 3
    # random nibbles + random power-of-two scales
    blocks = rng.randint(0, 256, (2, G, 16), np.uint8).astype(np.uint8)
    scales = rng.randint(120, 132, (2, G)).astype(np.uint8)
    out = mxfp4_dequant(blocks, scales)
    assert out.shape == (2, G * 32)
    E2M1 = [0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0,
            -0.0, -0.5, -1.0, -1.5, -2.0, -3.0, -4.0, -6.0]
    for r in range(2):
        for g in range(G):
            s = 2.0 ** (int(scales[r, g]) - 127)
            for b in range(16):
                byte = int(blocks[r, g, b])
                assert out[r, g * 32 + 2 * b] == E2M1[byte & 0xF] * s
                assert out[r, g * 32 + 2 * b + 1] == E2M1[byte >> 4] * s


def test_gpt_oss_registered():
    from lmdeploy_tpu.models import supported_archs
    assert 'GptOssForCausalLM' in supported_archs()
