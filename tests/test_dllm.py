"""Diffusion-LM (SDAR) block-denoising end-to-end tests on a tiny random
qwen3-style checkpoint (CPU jax).

Reference analog: ``lmdeploy/pytorch/strategies/dllm/`` — the engine must
reproduce a straightforward dense block-denoiser evaluated by full recompute
from the same checkpoint: block-causal attention, per-iteration KV rewrite of
the active block, committed-block KV refresh, and the unmasking strategies.
"""
import json
import os

import numpy as np
import pytest

MASK = 255          # mask token inside the 256-token tiny vocab
BLOCK = 4


@pytest.fixture(scope='module')
def sdar_model_dir(tmp_path_factory):
    """Tiny SDAR checkpoint: qwen3 weights (qk-norm) + SDAR architecture."""
    from safetensors.numpy import save_file

    from conftest import TINY_CFG, make_tiny_tokenizer

    path = tmp_path_factory.mktemp('tiny_sdar')
    cfg = dict(TINY_CFG)
    cfg['architectures'] = ['SDARForCausalLM']
    cfg['model_type'] = 'sdar'
    with open(path / 'config.json', 'w') as f:
        json.dump(cfg, f)
    make_tiny_tokenizer(str(path))

    rng = np.random.RandomState(11)
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
            p + 'self_attn.q_norm.weight': 1 + rng.randn(hd) * 0.1,
            p + 'self_attn.k_norm.weight': 1 + rng.randn(hd) * 0.1,
            p + 'mlp.gate_proj.weight': rng.randn(I, H) * 0.02,
            p + 'mlp.up_proj.weight': rng.randn(I, H) * 0.02,
            p + 'mlp.down_proj.weight': rng.randn(H, I) * 0.02,
        })
    tensors = {k: np.ascontiguousarray(v.astype(np.float32))
               for k, v in tensors.items()}
    save_file(tensors, str(path / 'model.safetensors'))
    return str(path)


def make_engine(model_dir, **dllm_kwargs):
    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import TpuEngineConfig
    cfg = TpuEngineConfig(dtype='float32', block_size=16, num_gpu_blocks=64,
                          max_batch_size=8, session_len=256,
                          max_prefill_token_num=64,
                          dllm_block_length=BLOCK,
                          dllm_mask_token=MASK, **dllm_kwargs)
    return Engine.from_pretrained(model_dir, cfg)


def run_async(coro):
    import asyncio
    loop = asyncio.new_event_loop()
    try:
        return loop.run_until_complete(coro)
    finally:
        loop.close()


def generate_ids(engine, session_id, prompt_ids, max_new=8, **gen_kwargs):
    from lmdeploy_tpu.messages import GenerationConfig

    async def run():
        inst = engine.create_instance()
        gen_kwargs.setdefault('ignore_eos', True)
        gen = GenerationConfig(max_new_tokens=max_new, **gen_kwargs)
        out = await inst.async_infer(session_id, prompt_ids, gen)
        await inst.async_end(session_id)
        return out

    return run_async(run())


# -- dense full-recompute reference ---------------------------------------------------

def dense_block_logits(params, cfg, ids):
    """Full-context forward with BLOCK-causal attention; logits [S, V]."""
    from lmdeploy_tpu.nn.layers import make_rope_table

    p = {k: np.asarray(v) if not isinstance(v, dict)
         else {k2: np.asarray(v2) for k2, v2 in v.items()}
         for k, v in params.items()}
    H, D = cfg.hidden_size, cfg.head_dim
    Hq, Hkv = cfg.num_attention_heads, cfg.num_key_value_heads
    G = Hq // Hkv
    cos_t, sin_t = make_rope_table(D, 512, cfg.rope_theta)
    cos_t, sin_t = np.asarray(cos_t), np.asarray(sin_t)

    def rmsnorm(x, w):
        return x / np.sqrt((x * x).mean(-1, keepdims=True)
                           + cfg.rms_norm_eps) * w

    def rope(x, pos):
        c, s = cos_t[pos][:, None, :], sin_t[pos][:, None, :]
        d2 = D // 2
        x1, x2 = x[..., :d2], x[..., d2:]
        return np.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], -1)

    S = len(ids)
    pos = np.arange(S)
    h = p['embed'][np.asarray(ids)]
    mask = (pos[None, :] // BLOCK) <= (pos[:, None] // BLOCK)
    for layer in range(cfg.num_layers):
        lw = {k: v[layer] for k, v in p['layers'].items()}
        x = rmsnorm(h, lw['attn_norm'])
        q = rmsnorm((x @ lw['wq']).reshape(S, Hq, D), lw['q_norm'])
        k = rmsnorm((x @ lw['wk']).reshape(S, Hkv, D), lw['k_norm'])
        v = (x @ lw['wv']).reshape(S, Hkv, D)
        q, k = rope(q, pos), rope(k, pos)
        kr = np.repeat(k, G, axis=1)
        vr = np.repeat(v, G, axis=1)
        scores = np.einsum('shd,thd->hst', q, kr) / np.sqrt(D)
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
    return h @ p['lm_head']


def dense_dllm_greedy(params, cfg, prompt, max_new, threshold=0.85,
                      strategy='low_confidence_dynamic', steps=None):
    """Dense block-denoiser: full recompute every iteration."""
    D = BLOCK
    P = len(prompt)
    rem = P % D
    start = P - rem
    work = list(prompt[:start])
    block = list(prompt[start:]) + [MASK] * (D - rem)
    masked = np.array([i >= rem for i in range(D)])
    fixed = rem
    out = []
    denoise_num = max(1, min(D // max(steps or D, 1), D))
    for _ in range(200):
        if len(out) >= max_new:
            break
        logits = dense_block_logits(params, cfg, work + block)
        lf = logits[start:start + D].astype(np.float64)
        probs = np.exp(lf - lf.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        tok = lf.argmax(-1)
        conf = probs[np.arange(D), tok]
        scores = np.where(masked, conf, 0.0)
        if strategy == 'low_confidence_static':
            unmask = np.zeros(D, bool)
            unmask[np.argsort(scores)[::-1][:denoise_num]] = True
            unmask &= masked
        elif strategy == 'sequential':
            unmask = np.zeros(D, bool)
            unmask[np.nonzero(masked)[0][:denoise_num]] = True
        else:
            unmask = masked & (scores >= threshold)
            unmask[np.argmax(scores)] = masked[np.argmax(scores)]
        if not unmask.any():
            unmask[int(np.argmax(scores))] = True
        for i in np.nonzero(unmask)[0]:
            block[i] = int(tok[i])
        masked = masked & ~unmask
        if not masked.any():
            out.extend(block[fixed:])
            work = work + block
            start += D
            fixed = 0
            block = [MASK] * D
            masked = np.ones(D, bool)
    return out[:max_new]


# -- tests ------------------------------------------------------------------------------

@pytest.fixture(scope='module')
def dllm_engine(sdar_model_dir):
    eng = make_engine(sdar_model_dir)
    yield eng
    eng.close()


def test_dllm_matches_dense_reference(dllm_engine):
    prompt = [1, 5, 9, 13, 20, 31, 7]          # 7 % 4 != 0: shared first block
    out = generate_ids(dllm_engine, 301, prompt, max_new=8)
    expect = dense_dllm_greedy(dllm_engine.model_agent.host_params(),
                               dllm_engine.model_config, prompt, 8)
    assert out.token_ids == expect


def test_dllm_aligned_prompt(dllm_engine):
    prompt = [1, 5, 9, 13, 20, 31, 7, 2]       # 8 % 4 == 0: fresh first block
    out = generate_ids(dllm_engine, 302, prompt, max_new=6)
    expect = dense_dllm_greedy(dllm_engine.model_agent.host_params(),
                               dllm_engine.model_config, prompt, 6)
    assert len(out.token_ids) == 6
    assert out.token_ids == expect


def test_dllm_concurrent_batching(dllm_engine):
    import asyncio

    from lmdeploy_tpu.messages import GenerationConfig

    rng = np.random.RandomState(3)
    prompts = [rng.randint(3, 250, size=n).tolist() for n in (5, 12, 9)]

    async def run_all():
        async def one(i, prompt):
            inst = dllm_engine.create_instance()
            out = await inst.async_infer(
                310 + i, prompt,
                GenerationConfig(max_new_tokens=8, ignore_eos=True))
            await inst.async_end(310 + i)
            return out.token_ids

        return await asyncio.gather(*[one(i, p)
                                      for i, p in enumerate(prompts)])

    results = run_async(run_all())
    for prompt, got in zip(prompts, results):
        expect = dense_dllm_greedy(dllm_engine.model_agent.host_params(),
                                   dllm_engine.model_config, prompt, 8)
        assert got == expect


@pytest.mark.parametrize('strategy,steps', [('low_confidence_static', 2),
                                            ('sequential', 2)])
def test_dllm_strategies(sdar_model_dir, strategy, steps):
    eng = make_engine(sdar_model_dir, dllm_unmasking_strategy=strategy,
                      dllm_denoising_steps=steps)
    try:
        prompt = [1, 5, 9, 13, 20]
        out = generate_ids(eng, 330, prompt, max_new=8)
        expect = dense_dllm_greedy(eng.model_agent.host_params(), eng.model_config,
                                   prompt, 8, strategy=strategy, steps=steps)
        assert out.token_ids == expect
    finally:
        eng.close()


def test_dllm_stop_token_mid_block(dllm_engine):
    """A stop token inside a committed block truncates the output at its
    FIRST occurrence, and (AR-path semantics) is stripped from the output."""
    prompt = [1, 5, 9, 13, 20, 31, 7]
    full = generate_ids(dllm_engine, 340, prompt, max_new=12)
    stop_tok = full.token_ids[5]
    out = generate_ids(dllm_engine, 341, prompt, max_new=12,
                       ignore_eos=False, stop_token_ids=[stop_tok])
    assert out.token_ids == full.token_ids[:full.token_ids.index(stop_tok)]
