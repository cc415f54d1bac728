"""End-to-end engine tests on a tiny random llama (CPU jax).

Includes a dense-reference check: the paged continuous-batching engine must produce the
same greedy continuation as a straightforward dense (non-paged) transformer evaluated
step by step from the same checkpoint — this exercises weight loading, RoPE, GQA,
paging, scheduling and sampling end to end.
"""
import numpy as np
import pytest

import jax.numpy as jnp


def dense_reference_greedy(params, cfg, prompt_ids, num_new):
    """Naive full-context greedy decode directly from the loaded param tree."""
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
        return x / np.sqrt((x * x).mean(-1, keepdims=True) + cfg.rms_norm_eps) * w

    def rope(x, pos):  # x [S, h, D]
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
            mask = np.tril(np.ones((S, S), bool))
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


@pytest.fixture(scope='module')
def engine(tiny_model_dir):
    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import TpuEngineConfig
    cfg = TpuEngineConfig(dtype='float32', block_size=16, num_gpu_blocks=64,
                          max_batch_size=8, session_len=256,
                          max_prefill_token_num=64)
    eng = Engine.from_pretrained(tiny_model_dir, cfg)
    yield eng
    eng.close()


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


def test_greedy_matches_dense_reference(engine):
    prompt = [1, 5, 9, 13, 20, 31, 7]
    out = generate_ids(engine, 101, prompt, max_new=8)
    expect = dense_reference_greedy(engine.model_agent.host_params(),
                                    engine.model_config, prompt, 8)
    assert out.token_ids == expect


def test_greedy_long_prompt_chunked(engine):
    # longer than max_prefill_token_num=64 => exercises chunked prefill
    rng = np.random.RandomState(7)
    prompt = rng.randint(3, 250, size=100).tolist()
    out = generate_ids(engine, 102, prompt, max_new=4)
    expect = dense_reference_greedy(engine.model_agent.host_params(),
                                    engine.model_config, prompt, 4)
    assert out.token_ids == expect


def test_concurrent_batching(engine):
    """Several concurrent requests must all match their dense references."""
    import asyncio
    from lmdeploy_tpu.messages import GenerationConfig

    rng = np.random.RandomState(3)
    prompts = [rng.randint(3, 250, size=n).tolist() for n in (5, 17, 33, 9)]

    async def run_all():
        async def one(i, prompt):
            inst = engine.create_instance()
            out = await inst.async_infer(200 + i, prompt,
                                         GenerationConfig(max_new_tokens=6,
                                                          ignore_eos=True))
            await inst.async_end(200 + i)
            return out.token_ids

        return await asyncio.gather(*[one(i, p) for i, p in enumerate(prompts)])

    results = run_async(run_all())
    for prompt, got in zip(prompts, results):
        expect = dense_reference_greedy(engine.model_agent.host_params(),
                                        engine.model_config, prompt, 6)
        assert got == expect


def test_stop_token(engine):
    prompt = [1, 5, 9, 13]
    ref = dense_reference_greedy(engine.model_agent.host_params(), engine.model_config,
                                 prompt, 8)
    stop_tok = ref[3]
    out = generate_ids(engine, 103, prompt, max_new=8, stop_token_ids=[stop_tok],
                       ignore_eos=False)
    # stops at the stop token, which is stripped from the output
    assert out.token_ids == ref[:3]


def test_max_new_tokens_cap(engine):
    out = generate_ids(engine, 104, [1, 2, 3], max_new=3)
    assert len(out.token_ids) == 3


def test_sampling_deterministic_with_seed(engine):
    a = generate_ids(engine, 105, [1, 5, 9], max_new=6, do_sample=True,
                     temperature=0.9, top_p=0.9, random_seed=1234)
    b = generate_ids(engine, 106, [1, 5, 9], max_new=6, do_sample=True,
                     temperature=0.9, top_p=0.9, random_seed=1234)
    assert a.token_ids == b.token_ids


def test_heterogeneous_budgets_exact_and_full_runs(engine):
    """Mixed max_new_tokens must (a) produce EXACTLY each row's budget and
    (b) not collapse the decode-run length to the shortest row.  Round-5
    regression: sizing k by the MIN remaining budget made every dispatch a
    near-per-token step under ShareGPT-like mixes (0.45 RPS vs the same
    engine's 11k tok/s decode phase); k now follows the MAX and the
    budget-aware drain discards each finished row's overrun steps."""
    import asyncio
    from lmdeploy_tpu.messages import GenerationConfig

    rng = np.random.RandomState(11)
    budgets = [3, 29, 11, 40]
    prompts = [rng.randint(3, 250, size=n).tolist() for n in (6, 12, 4, 20)]

    seen_k = []
    orig = engine.model_agent.decode_run

    def spy(num_rows, k=None, *a, **kw):
        seen_k.append(k)
        return orig(num_rows, k, *a, **kw)

    engine.model_agent.decode_run = spy
    try:
        async def run_all():
            async def one(i, prompt, budget):
                inst = engine.create_instance()
                out = await inst.async_infer(
                    300 + i, prompt,
                    GenerationConfig(max_new_tokens=budget, ignore_eos=True))
                await inst.async_end(300 + i)
                return out.token_ids

            return await asyncio.gather(
                *[one(i, p, b) for i, (p, b) in
                  enumerate(zip(prompts, budgets))])

        results = run_async(run_all())
    finally:
        engine.model_agent.decode_run = orig

    for prompt, budget, got in zip(prompts, budgets, results):
        assert len(got) == budget
        expect = dense_reference_greedy(engine.model_agent.host_params(),
                                        engine.model_config, prompt, budget)
        assert got == expect
    # while the 40-budget row was live alongside the finished 3-budget row,
    # runs must have kept the full k (the engine's decode_run_steps cap or
    # the max-remaining rounding), never the min row's 1-2-4 collapse
    assert seen_k, 'decode_run never dispatched'
    assert max(k for k in seen_k if k) >= min(
        engine.model_agent.decode_run_steps, 32)
