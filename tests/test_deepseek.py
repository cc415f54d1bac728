"""DeepSeek-V2 MLA + MoE tests on a tiny random checkpoint (CPU jax).

Two layers of evidence:
- absorbed-vs-expanded equivalence: MLA attention computed in latent space
  (what the engine runs) must equal the standard expanded-head attention;
- engine-vs-dense-reference: the paged engine's greedy continuation must match
  a naive numpy MLA transformer evaluated from the same loaded params.
"""
import json

import numpy as np
import pytest

from conftest import make_tiny_tokenizer

DS_CFG = {
    'architectures': ['DeepseekV2ForCausalLM'],
    'model_type': 'deepseek_v2',
    'hidden_size': 64,
    'intermediate_size': 96,
    'moe_intermediate_size': 32,
    'num_hidden_layers': 3,
    'first_k_dense_replace': 1,
    'num_attention_heads': 4,
    'num_key_value_heads': 4,
    'q_lora_rank': None,
    'kv_lora_rank': 32,
    'qk_nope_head_dim': 16,
    'qk_rope_head_dim': 8,
    'v_head_dim': 16,
    'n_routed_experts': 4,
    'n_shared_experts': 1,
    'num_experts_per_tok': 2,
    'norm_topk_prob': True,
    'routed_scaling_factor': 1.0,
    'scoring_func': 'softmax',
    'vocab_size': 128,
    'max_position_embeddings': 512,
    'rms_norm_eps': 1e-6,
    'rope_theta': 10000.0,
    'bos_token_id': 1,
    'eos_token_id': 2,
    'tie_word_embeddings': False,
    'torch_dtype': 'float32',
}


@pytest.fixture(scope='module')
def ds_model_dir(tmp_path_factory):
    from safetensors.numpy import save_file

    path = tmp_path_factory.mktemp('tiny_deepseek')
    with open(path / 'config.json', 'w') as f:
        json.dump(DS_CFG, f)
    make_tiny_tokenizer(str(path), vocab_size=128)
    rng = np.random.RandomState(11)
    c = DS_CFG
    H, V = c['hidden_size'], c['vocab_size']
    nh, dn, dr, dv, r = (c['num_attention_heads'], c['qk_nope_head_dim'],
                         c['qk_rope_head_dim'], c['v_head_dim'],
                         c['kv_lora_rank'])
    t = {
        'model.embed_tokens.weight': rng.randn(V, H) * 0.02,
        'model.norm.weight': np.ones(H),
        'lm_head.weight': rng.randn(V, H) * 0.02,
    }
    for l in range(c['num_hidden_layers']):
        p = f'model.layers.{l}.'
        t[p + 'input_layernorm.weight'] = np.ones(H)
        t[p + 'post_attention_layernorm.weight'] = np.ones(H)
        t[p + 'self_attn.q_proj.weight'] = rng.randn(nh * (dn + dr), H) * 0.05
        t[p + 'self_attn.kv_a_proj_with_mqa.weight'] = rng.randn(r + dr, H) * 0.05
        t[p + 'self_attn.kv_a_layernorm.weight'] = np.ones(r)
        t[p + 'self_attn.kv_b_proj.weight'] = rng.randn(nh * (dn + dv), r) * 0.05
        t[p + 'self_attn.o_proj.weight'] = rng.randn(H, nh * dv) * 0.05
        if l < c['first_k_dense_replace']:
            I = c['intermediate_size']
            t[p + 'mlp.gate_proj.weight'] = rng.randn(I, H) * 0.05
            t[p + 'mlp.up_proj.weight'] = rng.randn(I, H) * 0.05
            t[p + 'mlp.down_proj.weight'] = rng.randn(H, I) * 0.05
        else:
            E, Ie = c['n_routed_experts'], c['moe_intermediate_size']
            t[p + 'mlp.gate.weight'] = rng.randn(E, H) * 0.05
            for e in range(E):
                q = p + f'mlp.experts.{e}.'
                t[q + 'gate_proj.weight'] = rng.randn(Ie, H) * 0.05
                t[q + 'up_proj.weight'] = rng.randn(Ie, H) * 0.05
                t[q + 'down_proj.weight'] = rng.randn(H, Ie) * 0.05
            Is = c['n_shared_experts'] * Ie
            q = p + 'mlp.shared_experts.'
            t[q + 'gate_proj.weight'] = rng.randn(Is, H) * 0.05
            t[q + 'up_proj.weight'] = rng.randn(Is, H) * 0.05
            t[q + 'down_proj.weight'] = rng.randn(H, Is) * 0.05
    t = {k: np.ascontiguousarray(v.astype(np.float32)) for k, v in t.items()}
    save_file(t, str(path / 'model.safetensors'))
    return str(path)


def test_absorbed_equals_expanded():
    """score(q_c·[c|k_pe]) == score([q_nope W_uk? no — q_nope·k_nope]):
    the absorbed latent-space attention must equal standard MLA attention with
    per-head expanded keys/values."""
    rng = np.random.RandomState(0)
    S, nh, dn, dr, dv, r = 5, 2, 8, 4, 8, 16
    q_nope = rng.randn(S, nh, dn)
    q_pe = rng.randn(S, nh, dr)
    c = rng.randn(S, r)
    k_pe = rng.randn(S, dr)
    w_uk = rng.randn(nh, dn, r)
    w_uv = rng.randn(nh, r, dv)

    # expanded: per-head k_nope = c @ w_uk^T, v = c @ w_uv
    k_nope = np.einsum('sr,ndr->snd', c, w_uk)
    scores_exp = (np.einsum('snd,tnd->nst', q_nope, k_nope)
                  + np.einsum('snd,td->nst', q_pe, np.asarray(k_pe)))
    v = np.einsum('sr,nrv->snv', c, w_uv)

    # absorbed: q_c = q_nope @ w_uk; scores over [c | k_pe]
    q_c = np.einsum('snd,ndr->snr', q_nope, w_uk)
    q_eff = np.concatenate([q_c, q_pe], -1)
    k_eff = np.concatenate([c, k_pe], -1)
    scores_abs = np.einsum('snd,td->nst', q_eff, k_eff)
    np.testing.assert_allclose(scores_abs, scores_exp, rtol=1e-10)

    # output: attn @ c then w_uv == attn @ v
    attn = np.exp(scores_abs)
    attn /= attn.sum(-1, keepdims=True)
    o_latent = np.einsum('nst,tr->snr', attn, c)
    o_abs = np.einsum('snr,nrv->snv', o_latent, w_uv)
    o_exp = np.einsum('nst,tnv->snv', attn, v)
    np.testing.assert_allclose(o_abs, o_exp, rtol=1e-10)


def _np(x):
    return np.asarray(x)


def _deinterleave_np(x):
    *lead, d = x.shape
    return x.reshape(*lead, d // 2, 2).swapaxes(-1, -2).reshape(*lead, d)


def dense_mla_greedy(params, cfg, prompt_ids, num_new):
    """Naive numpy MLA transformer from the engine's loaded param tree."""
    from lmdeploy_tpu.nn.layers import make_rope_table

    c = cfg
    nh, dn, dr, dv, r = (c.num_attention_heads, c.qk_nope_head_dim,
                         c.qk_rope_head_dim, c.v_head_dim, c.kv_lora_rank)
    H = c.hidden_size
    eps = c.rms_norm_eps
    cos_t, sin_t = map(np.asarray, make_rope_table(dr, 512, c.rope_theta))

    def rn(x, w):
        return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * w

    def rope(x, pos):   # [S, h, dr]
        ct, st = cos_t[pos][:, None, :], sin_t[pos][:, None, :]
        d2 = dr // 2
        x1, x2 = x[..., :d2], x[..., d2:]
        return np.concatenate([x1 * ct - x2 * st, x2 * ct + x1 * st], -1)

    groups = []
    if 'layers' in params:
        groups.append(('layers', False, _np(params['layers']['attn_norm']).shape[0]))
    groups.append(('moe_layers', True, _np(params['moe_layers']['attn_norm']).shape[0]))

    ids = list(prompt_ids)
    for _ in range(num_new):
        S = len(ids)
        pos = np.arange(S)
        h = _np(params['embed'])[np.asarray(ids)]
        for gname, is_moe, L in groups:
            g = {k: _np(v) for k, v in params[gname].items()}
            for i in range(L):
                w = {k: v[i] for k, v in g.items()}
                x = rn(h, w['attn_norm'])
                q = (x @ w['wq']).reshape(S, nh, dn + dr)
                q_nope, q_pe = q[..., :dn], q[..., dn:]
                ckv = x @ w['wdkv']
                cv, k_pe = rn(ckv[..., :r], w['kv_norm']), ckv[..., r:]
                q_pe = rope(_deinterleave_np(q_pe), pos)
                k_pe = rope(_deinterleave_np(k_pe)[:, None, :], pos)[:, 0]
                q_c = np.einsum('snd,ndr->snr', q_nope, w['wuk'])
                q_eff = np.concatenate([q_c, q_pe], -1)
                k_eff = np.concatenate([cv, k_pe], -1)
                scores = np.einsum('snd,td->nst', q_eff, k_eff) / np.sqrt(dn + dr)
                mask = np.tril(np.ones((S, S), bool))
                scores = np.where(mask[None], scores, -1e30)
                p = np.exp(scores - scores.max(-1, keepdims=True))
                p /= p.sum(-1, keepdims=True)
                o_l = np.einsum('nst,tr->snr', p, cv)
                o = np.einsum('snr,nrv->snv', o_l, w['wuv']).reshape(S, nh * dv)
                h = h + o @ w['wo']
                x = rn(h, w['mlp_norm'])
                if not is_moe:
                    act = x @ w['w_gate']
                    act = act / (1 + np.exp(-act)) * (x @ w['w_up'])
                    h = h + act @ w['w_down']
                else:
                    logits = x @ w['router']
                    sc = np.exp(logits - logits.max(-1, keepdims=True))
                    sc /= sc.sum(-1, keepdims=True)
                    E = sc.shape[-1]
                    k_sel = DS_CFG['num_experts_per_tok']
                    idx = np.argsort(-sc, -1)[:, :k_sel]
                    tw = np.take_along_axis(sc, idx, -1)
                    tw = tw / (tw.sum(-1, keepdims=True) + 1e-20)
                    comb = np.zeros_like(sc)
                    np.put_along_axis(comb, idx, tw, -1)
                    out = np.zeros((S, H))
                    for e in range(E):
                        a = x @ w['we_gate'][e]
                        a = a / (1 + np.exp(-a)) * (x @ w['we_up'][e])
                        out += (a @ w['we_down'][e]) * comb[:, e:e + 1]
                    s = x @ w['ws_gate']
                    s = s / (1 + np.exp(-s)) * (x @ w['ws_up'])
                    h = h + out + s @ w['ws_down']
        h = rn(h, _np(params['final_norm']))
        ids.append(int(np.argmax(h[-1] @ _np(params['lm_head']))))
    return ids[len(prompt_ids):]


@pytest.fixture(scope='module')
def ds_engine(ds_model_dir):
    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import TpuEngineConfig
    cfg = TpuEngineConfig(dtype='float32', block_size=16, num_gpu_blocks=64,
                          max_batch_size=4, session_len=256,
                          max_prefill_token_num=64)
    eng = Engine.from_pretrained(ds_model_dir, cfg)
    yield eng
    eng.close()


def run_async(coro):
    import asyncio
    loop = asyncio.new_event_loop()
    try:
        return loop.run_until_complete(coro)
    finally:
        loop.close()


def test_config_mla_geometry(ds_engine):
    cfg = ds_engine.model_config
    assert cfg.is_mla and cfg.num_key_value_heads == 1
    assert cfg.cache_head_dim == 32 + 8
    assert cfg.rope_dim == 8
    # cache allocated at the padded latent dim
    # unified pages: one latent "head" -> row = 2 * kv_lora(+rope) lanes
    row = ds_engine.model_agent.cache_engine.kv_cache.shape[-1]
    assert row == ds_engine.model_agent.cache_engine.padded_row_width


def test_deepseek_greedy_matches_dense_reference(ds_engine):
    from lmdeploy_tpu.messages import GenerationConfig

    prompt = [5, 17, 23, 29, 31, 8, 9]

    async def run():
        inst = ds_engine.create_instance()
        out = await inst.async_infer(
            1, prompt, GenerationConfig(max_new_tokens=6, ignore_eos=True))
        await inst.async_end(1)
        return list(out.token_ids)

    got = run_async(run())
    expect = dense_mla_greedy(ds_engine.model_agent.host_params(),
                              ds_engine.model_config, prompt, 6)
    assert got == expect


def test_deepseek_multiturn_and_batch(ds_engine):
    """Chunked prefill + decode over block boundaries with the latent cache."""
    from lmdeploy_tpu.messages import GenerationConfig

    long_prompt = list(np.random.RandomState(2).randint(4, 120, size=70))

    async def run():
        inst = ds_engine.create_instance()
        out = await inst.async_infer(
            2, long_prompt, GenerationConfig(max_new_tokens=5, ignore_eos=True))
        await inst.async_end(2)
        return list(out.token_ids)

    got = run_async(run())
    expect = dense_mla_greedy(ds_engine.model_agent.host_params(),
                              ds_engine.model_config, long_prompt, 5)
    assert got == expect


def test_group_limited_routing():
    """n_group/topk_group restricts expert choice to the best groups."""
    import jax.numpy as jnp

    from lmdeploy_tpu.config import ModelConfig
    from lmdeploy_tpu.models.deepseek import DeepseekV2Model

    cfg = dict(DS_CFG)
    cfg.update(n_group=2, topk_group=1, num_experts_per_tok=2)
    mc = ModelConfig.from_hf_config(cfg, dtype='float32')
    mc.num_key_value_heads = 1
    model = DeepseekV2Model(mc)

    rng = np.random.RandomState(0)
    H, E, Ie = 64, 4, 32
    x = jnp.asarray(rng.randn(1, 3, H).astype(np.float32))
    w = {
        'router': jnp.asarray(rng.randn(H, E).astype(np.float32)),
        'router_bias': jnp.zeros(E),
        'we_gate': jnp.asarray(rng.randn(E, H, Ie).astype(np.float32) * 0.05),
        'we_up': jnp.asarray(rng.randn(E, H, Ie).astype(np.float32) * 0.05),
        'we_down': jnp.asarray(rng.randn(E, Ie, H).astype(np.float32) * 0.05),
    }
    out = model._moe_mlp(w, x)
    assert np.isfinite(np.asarray(out)).all()

    # numpy reference: with 2 groups of 2 experts and topk_group=1, both
    # selected experts must come from the group with the higher max score
    logits = np.asarray(x).reshape(-1, H) @ np.asarray(w['router'])
    sc = np.exp(logits - logits.max(-1, keepdims=True))
    sc /= sc.sum(-1, keepdims=True)
    grp = sc.reshape(-1, 2, 2)
    best_grp = grp.max(-1).argmax(-1)                     # [N]
    # recompute what the model selected by re-running its masked top-k
    choice = np.where(np.repeat(
        np.eye(2, dtype=bool)[best_grp], 2, axis=-1), sc, -np.inf)
    sel = np.argsort(-choice, -1)[:, :2]
    assert (sel // 2 == best_grp[:, None]).all()
