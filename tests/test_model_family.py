"""Model-family coverage: internlm2 wqkv split, gemma hooks, registry."""
import numpy as np
import pytest


def test_registry_covers_core_archs():
    from lmdeploy_tpu.models import supported_archs
    archs = supported_archs()
    for a in ('LlamaForCausalLM', 'MistralForCausalLM', 'Qwen2ForCausalLM',
              'Qwen3ForCausalLM', 'MixtralForCausalLM', 'Qwen2MoeForCausalLM',
              'InternLM2ForCausalLM', 'GemmaForCausalLM', 'Gemma2ForCausalLM'):
        assert a in archs


def test_internlm2_wqkv_split():
    from lmdeploy_tpu.config import ModelConfig
    from lmdeploy_tpu.models.internlm2 import InternLM2Model
    cfg = ModelConfig(num_layers=1, num_attention_heads=4, num_key_value_heads=2,
                      hidden_size=32, intermediate_size=64, vocab_size=64,
                      head_dim=8, dtype='float32', hf_arch='InternLM2ForCausalLM')
    model = InternLM2Model(cfg)
    plan = model.make_assign_plan()
    entry = plan['model.layers.0.attention.wqkv.weight']
    assert isinstance(entry, list) and len(entry) == 3
    # build a wqkv whose q/k/v parts are recognizable constants
    Hkv, G, D, H = 2, 2, 8, 32
    wqkv = np.zeros((Hkv * (G + 2) * D, H), np.float32)
    g = wqkv.reshape(Hkv, G + 2, D, H)
    g[:, :G] = 1.0    # q rows
    g[:, G] = 2.0     # k rows
    g[:, G + 1] = 3.0  # v rows
    (pq, fq, _), (pk, fk, _), (pv, fv, _) = entry
    assert np.all(fq(wqkv) == 1.0) and fq(wqkv).shape == (H, G * Hkv * D)
    assert np.all(fk(wqkv) == 2.0) and fk(wqkv).shape == (H, Hkv * D)
    assert np.all(fv(wqkv) == 3.0)


def test_gemma_hooks():
    import jax
    from lmdeploy_tpu.config import ModelConfig
    from lmdeploy_tpu.models import build_model
    cfg = ModelConfig(num_layers=1, num_attention_heads=2, num_key_value_heads=1,
                      hidden_size=16, intermediate_size=32, vocab_size=32,
                      head_dim=8, dtype='float32', hf_arch='GemmaForCausalLM',
                      hf_config={'final_logit_softcapping': 30.0})
    model = build_model(cfg)
    assert model.embed_scale == 4.0
    assert model.final_logit_softcap == 30.0
    assert cfg.tie_word_embeddings
    # (1 + w) norm adjustment present in the plan
    plan = model.make_assign_plan()
    path, transform, _ = plan['model.norm.weight']
    assert float(transform(np.zeros(16, np.float32))[0]) == 1.0
    # forward produces softcapped logits
    import jax.numpy as jnp
    from lmdeploy_tpu.models.llama import AttnMeta
    from lmdeploy_tpu.nn.layers import make_rope_table
    params = model.init_params(jax.random.PRNGKey(0))
    cos, sin = make_rope_table(8, 64, cfg.rope_theta)
    from lmdeploy_tpu.ops.attention import kv_row_width
    _, rowp = kv_row_width(1, 8)
    kv = jnp.zeros((1, 8, 2, 16, rowp), jnp.float32)
    meta = AttnMeta(block_tables=jnp.asarray([[1, 2]], jnp.int32),
                    history_lens=jnp.zeros(1, jnp.int32),
                    q_lens=jnp.asarray([3], jnp.int32))
    ids = jnp.asarray([[1, 2, 3]], jnp.int32)
    pos = jnp.asarray([[0, 1, 2]], jnp.int32)
    logits, _ = model.forward(params, ids, pos, kv, meta, cos, sin)
    assert float(jnp.abs(logits).max()) <= 30.0


def test_starcoder2_matches_transformers(tmp_path):
    """Greedy generation parity with transformers' Starcoder2ForCausalLM."""
    import asyncio
    import torch
    from transformers import Starcoder2Config, Starcoder2ForCausalLM
    from conftest import make_tiny_tokenizer

    path = str(tmp_path / 'tiny_sc2')
    cfg = Starcoder2Config(
        hidden_size=48, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=128,
        max_position_embeddings=256, norm_epsilon=1e-5, use_bias=True,
        rope_theta=10000.0, tie_word_embeddings=False,
        bos_token_id=1, eos_token_id=2,
        residual_dropout=0.0, embedding_dropout=0.0, attention_dropout=0.0)
    torch.manual_seed(11)
    hf = Starcoder2ForCausalLM(cfg).float().eval()
    hf.save_pretrained(path, safe_serialization=True)
    make_tiny_tokenizer(path, vocab_size=128)

    prompt = [3, 17, 42, 99, 7, 23]
    with torch.no_grad():
        want = hf.generate(torch.tensor([prompt]), max_new_tokens=8,
                           do_sample=False)[0, len(prompt):].tolist()

    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import GenerationConfig, TpuEngineConfig
    eng = Engine.from_pretrained(
        path, TpuEngineConfig(dtype='float32', block_size=16,
                              num_gpu_blocks=32, max_batch_size=2,
                              session_len=128, max_prefill_token_num=64))

    async def run():
        inst = eng.create_instance()
        out = await inst.async_infer(1, prompt,
                                     GenerationConfig(max_new_tokens=8,
                                                      ignore_eos=True))
        await inst.async_end(1)
        return list(out.token_ids)

    loop = asyncio.new_event_loop()
    try:
        got = loop.run_until_complete(run())
    finally:
        loop.close()
        eng.close()
    assert got == want, (got, want)


def _greedy_engine(path, prompt, n, session_len=160):
    import asyncio
    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import GenerationConfig, TpuEngineConfig
    eng = Engine.from_pretrained(
        path, TpuEngineConfig(dtype='float32', block_size=16,
                              num_gpu_blocks=48, max_batch_size=2,
                              session_len=session_len,
                              max_prefill_token_num=64))

    async def run():
        inst = eng.create_instance()
        out = await inst.async_infer(1, prompt,
                                     GenerationConfig(max_new_tokens=n,
                                                      ignore_eos=True))
        await inst.async_end(1)
        return list(out.token_ids)

    loop = asyncio.new_event_loop()
    try:
        return loop.run_until_complete(run())
    finally:
        loop.close()
        eng.close()


def _hf_greedy(model, prompt, n):
    import torch
    with torch.no_grad():
        return model.generate(torch.tensor([prompt]), max_new_tokens=n,
                              do_sample=False)[0, len(prompt):].tolist()


def test_gemma2_matches_transformers(tmp_path):
    """Sandwich norms + attn/final softcaps + query_pre_attn_scalar +
    even-layer sliding windows."""
    import torch
    from transformers import Gemma2Config, Gemma2ForCausalLM
    from conftest import make_tiny_tokenizer

    path = str(tmp_path / 'tiny_g2')
    cfg = Gemma2Config(
        hidden_size=48, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=12,
        vocab_size=128, max_position_embeddings=256, rms_norm_eps=1e-6,
        rope_theta=10000.0, query_pre_attn_scalar=24,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        sliding_window=16, attention_dropout=0.0,
        bos_token_id=1, eos_token_id=2, tie_word_embeddings=True)
    torch.manual_seed(13)
    hf = Gemma2ForCausalLM(cfg).float().eval()
    hf.save_pretrained(path, safe_serialization=True)
    make_tiny_tokenizer(path, vocab_size=128)

    import numpy as np
    rng = np.random.RandomState(2)
    prompt = rng.randint(3, 120, size=24).tolist()   # beyond the window
    want = _hf_greedy(hf, prompt, 8)
    got = _greedy_engine(path, prompt, 8)
    assert got == want, (got, want)


def test_gemma3_matches_transformers(tmp_path):
    """qk-norm, dual local/global rope, 5:1 sliding pattern."""
    import torch
    from transformers import Gemma3TextConfig
    from transformers.models.gemma3 import Gemma3ForCausalLM
    from conftest import make_tiny_tokenizer

    path = str(tmp_path / 'tiny_g3')
    cfg = Gemma3TextConfig(
        hidden_size=48, intermediate_size=96, num_hidden_layers=6,
        num_attention_heads=4, num_key_value_heads=2, head_dim=12,
        vocab_size=128, max_position_embeddings=512, rms_norm_eps=1e-6,
        rope_theta=1000000.0, rope_local_base_freq=10000.0,
        rope_scaling={'rope_type': 'linear', 'factor': 8.0},
        query_pre_attn_scalar=24, sliding_window=16,
        sliding_window_pattern=6, attention_dropout=0.0,
        bos_token_id=1, eos_token_id=2, tie_word_embeddings=True)
    torch.manual_seed(17)
    hf = Gemma3ForCausalLM(cfg).float().eval()
    hf.save_pretrained(path, safe_serialization=True)
    make_tiny_tokenizer(path, vocab_size=128)

    import numpy as np
    rng = np.random.RandomState(4)
    prompt = rng.randint(3, 120, size=30).tolist()
    want = _hf_greedy(hf, prompt, 8)
    got = _greedy_engine(path, prompt, 8)
    assert got == want, (got, want)


def test_phimoe_matches_transformers(tmp_path):
    """LayerNorm + biased attention + sparsemixer top-2 routing."""
    import torch
    from transformers import PhimoeConfig, PhimoeForCausalLM
    from conftest import make_tiny_tokenizer

    path = str(tmp_path / 'tiny_phimoe')
    cfg = PhimoeConfig(
        hidden_size=48, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=128,
        max_position_embeddings=256, rms_norm_eps=1e-5,
        num_local_experts=4, num_experts_per_tok=2,
        router_jitter_noise=0.01, input_jitter_noise=0.0,
        rope_theta=10000.0, attention_bias=True, lm_head_bias=True,
        sliding_window=None, attention_dropout=0.0,
        bos_token_id=1, eos_token_id=2, tie_word_embeddings=False)
    torch.manual_seed(19)
    hf = PhimoeForCausalLM(cfg).float().eval()
    hf.save_pretrained(path, safe_serialization=True)
    make_tiny_tokenizer(path, vocab_size=128)

    import numpy as np
    rng = np.random.RandomState(6)
    prompt = rng.randint(3, 120, size=12).tolist()
    want = _hf_greedy(hf, prompt, 8)
    got = _greedy_engine(path, prompt, 8)
    assert got == want, (got, want)


def test_glm4_moe_matches_transformers(tmp_path):
    """GLM-4.5: llama attention (qk-norm, partial rotate-half rope) +
    DeepSeek-style sigmoid group-routed MoE with shared experts."""
    import torch
    from transformers import Glm4MoeConfig, Glm4MoeForCausalLM
    from conftest import make_tiny_tokenizer

    path = str(tmp_path / 'tiny_glm4moe')
    cfg = Glm4MoeConfig(
        hidden_size=48, intermediate_size=96, moe_intermediate_size=32,
        num_hidden_layers=3, first_k_dense_replace=1,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        partial_rotary_factor=0.5, attention_bias=True, use_qk_norm=True,
        n_routed_experts=4, n_shared_experts=1, num_experts_per_tok=2,
        n_group=2, topk_group=1, norm_topk_prob=True,
        routed_scaling_factor=1.0, vocab_size=128,
        max_position_embeddings=256, rms_norm_eps=1e-5, rope_theta=10000.0,
        attention_dropout=0.0, bos_token_id=1, eos_token_id=2,
        tie_word_embeddings=False)
    torch.manual_seed(23)
    hf = Glm4MoeForCausalLM(cfg).float().eval()
    hf.save_pretrained(path, safe_serialization=True)
    make_tiny_tokenizer(path, vocab_size=128)

    import numpy as np
    rng = np.random.RandomState(8)
    prompt = rng.randint(3, 120, size=14).tolist()
    want = _hf_greedy(hf, prompt, 8)
    got = _greedy_engine(path, prompt, 8)
    assert got == want, (got, want)


def test_baichuan_equals_llama(tmp_path, tiny_model_dir):
    """Baichuan-7B is llama with a fused W_pack: converting the tiny llama
    checkpoint to baichuan naming must reproduce identical greedy tokens."""
    import glob
    import json
    import shutil
    from safetensors.numpy import load_file, save_file

    src = tiny_model_dir
    path = str(tmp_path / 'tiny_baichuan')
    shutil.copytree(src, path)
    cfg = json.load(open(f'{path}/config.json'))
    cfg['architectures'] = ['BaichuanForCausalLM']
    json.dump(cfg, open(f'{path}/config.json', 'w'))
    t = load_file(glob.glob(f'{path}/*.safetensors')[0])
    import numpy as np
    out = {}
    for k, v in t.items():
        if 'self_attn.q_proj' in k:
            base = k.replace('q_proj.weight', '')
            out[base + 'W_pack.weight'] = np.concatenate(
                [t[base + 'q_proj.weight'], t[base + 'k_proj.weight'],
                 t[base + 'v_proj.weight']])
        elif 'k_proj' in k or 'v_proj' in k:
            continue
        else:
            out[k] = v
    save_file(out, glob.glob(f'{path}/*.safetensors')[0])

    prompt = [3, 17, 42, 99, 7, 23]
    want = _greedy_engine(src, prompt, 8)
    got = _greedy_engine(path, prompt, 8)
    assert got == want, (got, want)


def test_deepseek_v1_moe(tmp_path):
    """DeepSeek-MoE v1 (softmax routing, shared experts, dense first layer)
    generates sanely and deterministically through the engine."""
    import json
    import numpy as np
    from safetensors.numpy import save_file
    from conftest import make_tiny_tokenizer

    path = str(tmp_path / 'tiny_dsv1')
    import os
    os.makedirs(path)
    H, Ie, E = 48, 32, 4
    cfg = {'architectures': ['DeepseekForCausalLM'], 'model_type': 'deepseek',
           'hidden_size': H, 'intermediate_size': 96,
           'moe_intermediate_size': Ie, 'num_hidden_layers': 2,
           'first_k_dense_replace': 1, 'n_routed_experts': E,
           'n_shared_experts': 1, 'num_experts_per_tok': 2,
           'norm_topk_prob': False, 'scoring_func': 'softmax',
           'num_attention_heads': 4, 'num_key_value_heads': 2, 'head_dim': 12,
           'vocab_size': 128, 'max_position_embeddings': 256,
           'rms_norm_eps': 1e-6, 'rope_theta': 10000.0,
           'torch_dtype': 'float32', 'tie_word_embeddings': False}
    json.dump(cfg, open(f'{path}/config.json', 'w'))
    make_tiny_tokenizer(path, vocab_size=128)
    rng = np.random.RandomState(31)
    t = {'model.embed_tokens.weight': rng.randn(128, H) * 0.02,
         'model.norm.weight': np.ones(H),
         'lm_head.weight': rng.randn(128, H) * 0.02}
    for l in range(2):
        p = f'model.layers.{l}.'
        t[p + 'input_layernorm.weight'] = np.ones(H)
        t[p + 'post_attention_layernorm.weight'] = np.ones(H)
        t[p + 'self_attn.q_proj.weight'] = rng.randn(48, H) * 0.05
        t[p + 'self_attn.k_proj.weight'] = rng.randn(24, H) * 0.05
        t[p + 'self_attn.v_proj.weight'] = rng.randn(24, H) * 0.05
        t[p + 'self_attn.o_proj.weight'] = rng.randn(H, 48) * 0.05
        if l == 0:
            t[p + 'mlp.gate_proj.weight'] = rng.randn(96, H) * 0.05
            t[p + 'mlp.up_proj.weight'] = rng.randn(96, H) * 0.05
            t[p + 'mlp.down_proj.weight'] = rng.randn(H, 96) * 0.05
        else:
            t[p + 'mlp.gate.weight'] = rng.randn(E, H) * 0.05
            for e in range(E):
                q = p + f'mlp.experts.{e}.'
                t[q + 'gate_proj.weight'] = rng.randn(Ie, H) * 0.05
                t[q + 'up_proj.weight'] = rng.randn(Ie, H) * 0.05
                t[q + 'down_proj.weight'] = rng.randn(H, Ie) * 0.05
            q = p + 'mlp.shared_experts.'
            t[q + 'gate_proj.weight'] = rng.randn(Ie, H) * 0.05
            t[q + 'up_proj.weight'] = rng.randn(Ie, H) * 0.05
            t[q + 'down_proj.weight'] = rng.randn(H, Ie) * 0.05
    save_file({k: np.ascontiguousarray(np.asarray(v, np.float32))
               for k, v in t.items()}, f'{path}/model.safetensors')

    prompt = [3, 17, 42, 99, 7]
    a = _greedy_engine(path, prompt, 8)
    b = _greedy_engine(path, prompt, 8)
    assert a == b and len(a) == 8


def test_llama4_matches_transformers(tmp_path):
    """Llama-4: interleaved dense/MoE blocks, NoPE every 4th layer with
    temperature tuning + full attention, chunked attention + qk L2-norm on
    rope layers, sigmoid-input-scaled top-1 MoE with a shared expert."""
    import torch
    from transformers import Llama4TextConfig, Llama4ForCausalLM
    from conftest import make_tiny_tokenizer

    path = str(tmp_path / 'tiny_llama4')
    cfg = Llama4TextConfig(
        hidden_size=48, intermediate_size=32, intermediate_size_mlp=96,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, num_local_experts=4, num_experts_per_tok=1,
        interleave_moe_layer_step=2, use_qk_norm=True,
        attention_chunk_size=8, attn_temperature_tuning=True,
        floor_scale=8, attn_scale=0.1,
        vocab_size=128, max_position_embeddings=256, rms_norm_eps=1e-5,
        rope_theta=10000.0, rope_scaling=None, attention_bias=False,
        bos_token_id=1, eos_token_id=2, tie_word_embeddings=False)
    torch.manual_seed(41)
    hf = Llama4ForCausalLM(cfg).float().eval()
    hf.save_pretrained(path, safe_serialization=True)
    make_tiny_tokenizer(path, vocab_size=128)

    import numpy as np
    rng = np.random.RandomState(9)
    # long enough that chunked attention (chunk 8) actually truncates context
    prompt = rng.randint(3, 120, size=21).tolist()
    want = _hf_greedy(hf, prompt, 8)
    got = _greedy_engine(path, prompt, 8)
    assert got == want, (got, want)


def test_chatglm_matches_transformers_glm(tmp_path):
    """Legacy THUDM chatglm format == native transformers Glm: a tiny
    GlmForCausalLM renamed to transformer.encoder.* with fused
    query_key_value / dense_h_to_4h and legacy config fields must reproduce
    the transformers greedy output token-for-token."""
    import json
    import torch
    from transformers import GlmConfig, GlmForCausalLM
    from safetensors.numpy import save_file
    from conftest import make_tiny_tokenizer

    cfg = GlmConfig(
        hidden_size=48, intermediate_size=96, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        partial_rotary_factor=0.5, attention_bias=True, vocab_size=128,
        max_position_embeddings=256, rms_norm_eps=1e-5, rope_theta=10000.0,
        bos_token_id=1, eos_token_id=2, pad_token_id=0,
        tie_word_embeddings=False)
    torch.manual_seed(77)
    hf = GlmForCausalLM(cfg).float().eval()

    path = str(tmp_path / 'tiny_chatglm')
    import os
    os.makedirs(path)
    legacy_cfg = {
        'architectures': ['ChatGLMModel'], 'model_type': 'chatglm',
        'num_layers': 3, 'hidden_size': 48, 'ffn_hidden_size': 96,
        'num_attention_heads': 4, 'multi_query_attention': True,
        'multi_query_group_num': 2, 'kv_channels': 16,
        'padded_vocab_size': 128, 'seq_length': 256,
        'layernorm_epsilon': 1e-5, 'add_qkv_bias': True,
        'add_bias_linear': False, 'rope_ratio': 1.0,
        'bos_token_id': 1, 'eos_token_id': 2, 'torch_dtype': 'float32',
    }
    json.dump(legacy_cfg, open(f'{path}/config.json', 'w'))
    make_tiny_tokenizer(path, vocab_size=128)

    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    t = {
        'transformer.embedding.word_embeddings.weight':
            sd['model.embed_tokens.weight'],
        'transformer.encoder.final_layernorm.weight':
            sd['model.norm.weight'],
        'transformer.output_layer.weight': sd['lm_head.weight'],
    }
    for l in range(3):
        src = f'model.layers.{l}.'
        dst = f'transformer.encoder.layers.{l}.'
        t[dst + 'input_layernorm.weight'] = sd[src + 'input_layernorm.weight']
        t[dst + 'post_attention_layernorm.weight'] = \
            sd[src + 'post_attention_layernorm.weight']
        t[dst + 'self_attention.query_key_value.weight'] = np.concatenate(
            [sd[src + 'self_attn.q_proj.weight'],
             sd[src + 'self_attn.k_proj.weight'],
             sd[src + 'self_attn.v_proj.weight']])
        t[dst + 'self_attention.query_key_value.bias'] = np.concatenate(
            [sd[src + 'self_attn.q_proj.bias'],
             sd[src + 'self_attn.k_proj.bias'],
             sd[src + 'self_attn.v_proj.bias']])
        t[dst + 'self_attention.dense.weight'] = \
            sd[src + 'self_attn.o_proj.weight']
        t[dst + 'mlp.dense_h_to_4h.weight'] = \
            sd[src + 'mlp.gate_up_proj.weight']
        t[dst + 'mlp.dense_4h_to_h.weight'] = \
            sd[src + 'mlp.down_proj.weight']
    t = {k: np.ascontiguousarray(np.asarray(v, np.float32))
         for k, v in t.items()}
    save_file(t, f'{path}/model.safetensors')

    rng = np.random.RandomState(5)
    prompt = rng.randint(3, 120, size=11).tolist()
    want = _hf_greedy(hf, prompt, 8)
    got = _greedy_engine(path, prompt, 8)
    assert got == want, (got, want)
