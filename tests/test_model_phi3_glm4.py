"""Phi-3 (fused qkv/gate_up + LongRoPE) and GLM-4 (partial interleaved rotary
+ sandwich norms) family tests against dense numpy references."""
import json
import os

import numpy as np
import pytest

import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Phi-3: compute is llama; the checkpoint packs qkv_proj / gate_up_proj.
# Fusing the tiny-llama fixture's weights into phi3 format must reproduce the
# llama engine's greedy output token-for-token.
# ---------------------------------------------------------------------------

def _make_phi3_ckpt_from_llama(tiny_model_dir, out_dir):
    import safetensors.numpy as st
    from conftest import TINY_CFG

    os.makedirs(out_dir, exist_ok=True)
    cfg = dict(TINY_CFG)
    cfg['architectures'] = ['Phi3ForCausalLM']
    cfg['model_type'] = 'phi3'
    with open(os.path.join(out_dir, 'config.json'), 'w') as f:
        json.dump(cfg, f)
    for name in ('tokenizer.json', 'tokenizer_config.json'):
        src = os.path.join(tiny_model_dir, name)
        if os.path.exists(src):
            import shutil
            shutil.copy(src, os.path.join(out_dir, name))
    w = {}
    import glob
    for f in glob.glob(os.path.join(tiny_model_dir, '*.safetensors')):
        w.update(st.load_file(f))
    out = {}
    L = cfg['num_hidden_layers']
    for k, v in w.items():
        if 'self_attn.' in k or 'mlp.' in k:
            continue
        out[k] = v
    for l in range(L):
        p = f'model.layers.{l}.'
        out[p + 'self_attn.qkv_proj.weight'] = np.concatenate([
            w[p + 'self_attn.q_proj.weight'],
            w[p + 'self_attn.k_proj.weight'],
            w[p + 'self_attn.v_proj.weight']])
        out[p + 'self_attn.o_proj.weight'] = w[p + 'self_attn.o_proj.weight']
        out[p + 'mlp.gate_up_proj.weight'] = np.concatenate([
            w[p + 'mlp.gate_proj.weight'], w[p + 'mlp.up_proj.weight']])
        out[p + 'mlp.down_proj.weight'] = w[p + 'mlp.down_proj.weight']
    st.save_file(out, os.path.join(out_dir, 'model.safetensors'))
    return out_dir


def _generate(model_dir, prompt, max_new=8, **cfg_kwargs):
    import asyncio
    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import GenerationConfig, TpuEngineConfig

    cfg = TpuEngineConfig(dtype='float32', block_size=16, num_gpu_blocks=48,
                          max_batch_size=4, session_len=128,
                          max_prefill_token_num=64, **cfg_kwargs)
    eng = Engine.from_pretrained(model_dir, cfg)
    try:
        async def run():
            inst = eng.create_instance()
            out = await inst.async_infer(
                1, prompt, GenerationConfig(max_new_tokens=max_new,
                                            ignore_eos=True))
            await inst.async_end(1)
            return list(out.token_ids)

        loop = asyncio.new_event_loop()
        try:
            return loop.run_until_complete(run())
        finally:
            loop.close()
    finally:
        eng.close()


def test_phi3_fused_ckpt_matches_llama(tiny_model_dir, tmp_path):
    phi3_dir = _make_phi3_ckpt_from_llama(tiny_model_dir, str(tmp_path / 'phi3'))
    prompt = [1, 5, 9, 13, 20, 31, 7]
    assert _generate(phi3_dir, prompt) == _generate(tiny_model_dir, prompt)


def test_longrope_scaling():
    from lmdeploy_tpu.nn.layers import make_rope_table

    D, orig = 16, 64
    short = [1.0] * (D // 2)
    long = [4.0] * (D // 2)
    scaling = {'rope_type': 'longrope', 'short_factor': short,
               'long_factor': long, 'original_max_position_embeddings': orig}
    cos_l, _ = make_rope_table(D, 256, 10000.0, scaling)     # > orig: long
    cos_s, _ = make_rope_table(D, 64, 10000.0, scaling)      # <= orig: short
    cos_base, _ = make_rope_table(D, 64, 10000.0, None)
    # short factors of 1.0 only add the sqrt attention factor... none (64<=64)
    np.testing.assert_allclose(np.asarray(cos_s), np.asarray(cos_base),
                               rtol=1e-6)
    # long factors rescale frequencies: angle at pos p = p * inv_freq / 4,
    # so cos_l[4p] == cos_base[p] modulo the attention factor
    import math
    af = math.sqrt(1 + math.log(256 / orig) / math.log(orig))
    np.testing.assert_allclose(np.asarray(cos_l)[60] / af,
                               np.asarray(cos_base)[15], rtol=1e-5)


# ---------------------------------------------------------------------------
# GLM-4: dense numpy reference with partial interleaved rotary + sandwich norms
# ---------------------------------------------------------------------------

GLM4_CFG = {
    'architectures': ['Glm4ForCausalLM'],
    'model_type': 'glm4',
    'hidden_size': 64,
    'intermediate_size': 128,
    'num_hidden_layers': 2,
    'num_attention_heads': 4,
    'num_key_value_heads': 2,
    'head_dim': 16,
    'partial_rotary_factor': 0.5,
    'vocab_size': 256,
    'max_position_embeddings': 512,
    'rms_norm_eps': 1e-6,
    'rope_theta': 10000.0,
    'attention_bias': False,
    'eos_token_id': 2,
    'tie_word_embeddings': False,
    'torch_dtype': 'float32',
}


def _glm4_dense_reference(params, cfg, prompt_ids, num_new):
    from lmdeploy_tpu.nn.layers import make_rope_table

    p = {k: np.asarray(v) if not isinstance(v, dict)
         else {k2: np.asarray(v2) for k2, v2 in v.items()}
         for k, v in params.items()}
    H, D = cfg.hidden_size, cfg.head_dim
    Hq, Hkv = cfg.num_attention_heads, cfg.num_key_value_heads
    G = Hq // Hkv
    R = cfg.rope_dim
    cos_t, sin_t = make_rope_table(R, 512, cfg.rope_theta)
    cos_t, sin_t = np.asarray(cos_t), np.asarray(sin_t)

    def rmsnorm(x, w):
        return x / np.sqrt((x * x).mean(-1, keepdims=True) + cfg.rms_norm_eps) * w

    def rope_partial(x, pos):   # [S, h, D]; interleaved pairs on first R dims
        rot = x[..., :R]
        S, h, _ = rot.shape
        deint = rot.reshape(S, h, R // 2, 2).swapaxes(-1, -2).reshape(S, h, R)
        c, s = cos_t[pos][:, None, :], sin_t[pos][:, None, :]
        r2 = R // 2
        x1, x2 = deint[..., :r2], deint[..., r2:]
        rotated = np.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], -1)
        reint = rotated.reshape(S, h, 2, r2).swapaxes(-1, -2).reshape(S, h, R)
        return np.concatenate([reint, x[..., R:]], -1)

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
            q, k = rope_partial(q, pos), rope_partial(k, pos)
            kr = np.repeat(k, G, axis=1)
            vr = np.repeat(v, G, axis=1)
            scores = np.einsum('shd,thd->hst', q, kr) / np.sqrt(D)
            mask = np.tril(np.ones((S, S), bool))
            scores = np.where(mask[None], scores, -1e30)
            probs = np.exp(scores - scores.max(-1, keepdims=True))
            probs /= probs.sum(-1, keepdims=True)
            attn = np.einsum('hst,thd->shd', probs, vr).reshape(S, Hq * D)
            h = h + rmsnorm(attn @ lw['wo'], lw['post_attn_norm'])
            x = rmsnorm(h, lw['mlp_norm'])
            act = (x @ lw['w_gate'])
            act = act / (1 + np.exp(-act)) * (x @ lw['w_up'])
            h = h + rmsnorm(act @ lw['w_down'], lw['post_mlp_norm'])
        h = rmsnorm(h, p['final_norm'])
        logits = h[-1] @ p['lm_head']
        ids.append(int(np.argmax(logits)))
    return ids[len(prompt_ids):]


@pytest.fixture(scope='module')
def glm4_dir(tmp_path_factory):
    from conftest import make_tiny_tokenizer
    d = str(tmp_path_factory.mktemp('glm4'))
    with open(os.path.join(d, 'config.json'), 'w') as f:
        json.dump(GLM4_CFG, f)
    make_tiny_tokenizer(d)
    return d


def test_glm4_matches_dense_reference(glm4_dir):
    import asyncio
    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import GenerationConfig, TpuEngineConfig

    cfg = TpuEngineConfig(dtype='float32', block_size=16, num_gpu_blocks=48,
                          max_batch_size=4, session_len=128,
                          max_prefill_token_num=64, empty_init=True)
    eng = Engine.from_pretrained(glm4_dir, cfg)
    try:
        assert eng.model_agent.model.sandwich_norms
        assert eng.model_config.rope_dim == 8
        prompt = [1, 5, 9, 13, 20, 31, 7]

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
        expect = _glm4_dense_reference(eng.model_agent.host_params(),
                                       eng.model_config, prompt, 8)
        assert got == expect
    finally:
        eng.close()


def test_registry_new_archs():
    from lmdeploy_tpu.models import supported_archs
    archs = supported_archs()
    for a in ('Phi3ForCausalLM', 'Glm4ForCausalLM', 'GlmForCausalLM',
              'Qwen3MoeForCausalLM'):
        assert a in archs
