"""Runtime-quantized MoE experts: fp8-blocked (DeepSeek-V3) and MXFP4 (gpt-oss)
expert stacks stay quantized in HBM and dequantize inside ops/pallas/quant_bmm.py.

Reference analog: lmdeploy/pytorch/nn/moe/blocked_fp8.py and nn/moe/v4_fp4.py.
"""
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import make_tiny_tokenizer


# -- kernels (interpret mode) --------------------------------------------------------

def test_fp8_bmm_kernel_matches_reference():
    from lmdeploy_tpu.ops.pallas.quant_bmm import fp8_bmm, fp8_bmm_reference

    rng = np.random.RandomState(0)
    E, M, K, N = 4, 24, 256, 256
    w8 = jnp.asarray(rng.randn(E, K, N).astype(np.float32) * 0.1,
                     jnp.float8_e4m3fn)
    gs = jnp.asarray(np.abs(rng.randn(E, K // 128, N)).astype(np.float32) + .5)
    for x in (jnp.asarray(rng.randn(M, K).astype(np.float32)),
              jnp.asarray(rng.randn(E, M, K).astype(np.float32))):
        y = fp8_bmm(x, w8, gs, interpret=True)
        yr = fp8_bmm_reference(x, w8, gs)
        np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                                   rtol=1e-5, atol=1e-5)


def test_fp8_bmm_small_group():
    """Group size inferred from shapes (tests use 32-blocks)."""
    from lmdeploy_tpu.ops.pallas.quant_bmm import fp8_bmm, fp8_bmm_reference

    rng = np.random.RandomState(1)
    E, M, K, N = 2, 8, 64, 128
    w8 = jnp.asarray(rng.randn(E, K, N).astype(np.float32) * 0.1,
                     jnp.float8_e4m3fn)
    gs = jnp.asarray(np.abs(rng.randn(E, K // 32, N)).astype(np.float32) + .5)
    x = jnp.asarray(rng.randn(M, K).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(fp8_bmm(x, w8, gs, interpret=True)),
        np.asarray(fp8_bmm_reference(x, w8, gs)), rtol=1e-5, atol=1e-5)


def test_mxfp4_bmm_kernel_matches_reference():
    from lmdeploy_tpu.ops.pallas.quant_bmm import mxfp4_bmm, mxfp4_bmm_reference

    rng = np.random.RandomState(2)
    E, M, K, N = 4, 24, 256, 256
    nib = jnp.asarray(rng.randint(0, 256, size=(E, K // 2, N)), jnp.uint8)
    sc = jnp.asarray(np.exp2(rng.randint(-8, 2, size=(E, K // 32, N)))
                     .astype(np.float32))
    for x in (jnp.asarray(rng.randn(M, K).astype(np.float32)),
              jnp.asarray(rng.randn(E, M, K).astype(np.float32))):
        y = mxfp4_bmm(x, nib, sc, interpret=True)
        yr = mxfp4_bmm_reference(x, nib, sc)
        np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                                   rtol=1e-4, atol=1e-4)


def test_e2m1_decode_table():
    """Arithmetic e2m1 decode matches the published value table."""
    from lmdeploy_tpu.lite.formats import _E2M1
    from lmdeploy_tpu.ops.pallas.quant_bmm import _decode_e2m1

    got = np.asarray(_decode_e2m1(jnp.arange(16, dtype=jnp.int32)))
    np.testing.assert_array_equal(got, _E2M1)


def test_fp8_decode_exact():
    """Arithmetic e4m3 bit decode matches numpy's fp8 semantics (incl.
    subnormals and both signs)."""
    import ml_dtypes
    from lmdeploy_tpu.ops.pallas.quant_bmm import _decode_fp8_e4m3

    bits = np.arange(256, dtype=np.uint8)
    # skip the two NaN encodings 0x7f / 0xff
    keep = (bits & 0x7F) != 0x7F
    want = bits.view(ml_dtypes.float8_e4m3fn).astype(np.float32)
    got = np.asarray(_decode_fp8_e4m3(jnp.asarray(bits, jnp.int32)))
    np.testing.assert_array_equal(got[keep], want[keep])


# -- moe_ffn with quantized leaves ---------------------------------------------------

def test_moe_ffn_quant_leaves_match_widened():
    from lmdeploy_tpu.ops.moe import moe_ffn
    from lmdeploy_tpu.ops.pallas.quant_bmm import widen_fp8

    rng = np.random.RandomState(3)
    N, H, E, Ie, k = 10, 64, 4, 32, 2
    w8g = jnp.asarray(rng.randn(E, H, Ie).astype(np.float32) * .2,
                      jnp.float8_e4m3fn)
    w8u = jnp.asarray(rng.randn(E, H, Ie).astype(np.float32) * .2,
                      jnp.float8_e4m3fn)
    w8d = jnp.asarray(rng.randn(E, Ie, H).astype(np.float32) * .2,
                      jnp.float8_e4m3fn)
    gsg = jnp.asarray(np.abs(rng.randn(E, H // 32, Ie)).astype(np.float32) + .5)
    gsu = jnp.asarray(np.abs(rng.randn(E, H // 32, Ie)).astype(np.float32) + .5)
    gsd = jnp.asarray(np.abs(rng.randn(E, Ie // 32, H)).astype(np.float32) + .5)
    xf = jnp.asarray(rng.randn(N, H).astype(np.float32)).astype(jnp.bfloat16)
    top_idx = jnp.asarray(rng.randint(0, E, size=(N, k)), jnp.int32)
    top_w = jnp.asarray(np.abs(rng.rand(N, k)).astype(np.float32))
    bias = tuple(jnp.asarray(rng.randn(*s).astype(np.float32) * .1)
                 for s in ((E, Ie), (E, Ie), (E, H)))

    got = moe_ffn(xf, top_idx, top_w,
                  {'w8': w8g, 'gscale': gsg}, {'w8': w8u, 'gscale': gsu},
                  {'w8': w8d, 'gscale': gsd}, jnp.bfloat16, biases=bias)
    want = moe_ffn(xf, top_idx, top_w, widen_fp8(w8g, gsg),
                   widen_fp8(w8u, gsu), widen_fp8(w8d, gsd), jnp.bfloat16,
                   allow_ragged=False, biases=bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


# -- DeepSeek-V3 fp8-resident experts e2e --------------------------------------------

def _quantize_blocked(w, bn, bk):
    """HF layout [N, K] -> (w8 [N, K], scale_inv [ceil(N/bn), ceil(K/bk)])."""
    import ml_dtypes

    N, K = w.shape
    nb, kb = -(-N // bn), -(-K // bk)
    w8 = np.zeros_like(w)
    s = np.zeros((nb, kb), np.float32)
    for i in range(nb):
        for j in range(kb):
            blk = w[i * bn:(i + 1) * bn, j * bk:(j + 1) * bk]
            sc = np.abs(blk).max() / 448.0 + 1e-8
            s[i, j] = sc
            w8[i * bn:(i + 1) * bn, j * bk:(j + 1) * bk] = blk / sc
    return w8.astype(ml_dtypes.float8_e4m3fn), s


DSQ_CFG = {
    'architectures': ['DeepseekV3ForCausalLM'],
    'model_type': 'deepseek_v3',
    'hidden_size': 64,
    'intermediate_size': 96,
    'moe_intermediate_size': 32,
    'num_hidden_layers': 2,
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
    'scoring_func': 'sigmoid',
    'vocab_size': 128,
    'max_position_embeddings': 512,
    'rms_norm_eps': 1e-6,
    'rope_theta': 10000.0,
    'eos_token_id': 2,
    'tie_word_embeddings': False,
    'torch_dtype': 'bfloat16',
    'quantization_config': {'quant_method': 'fp8', 'fmt': 'e4m3',
                            'weight_block_size': [32, 32]},
}


@pytest.fixture(scope='module')
def ds_fp8_dir(tmp_path_factory):
    """Tiny DeepSeek-V3 checkpoint in native blocked-fp8 (every linear)."""
    from safetensors.numpy import save_file

    path = tmp_path_factory.mktemp('tiny_ds_fp8')
    with open(path / 'config.json', 'w') as f:
        json.dump(DSQ_CFG, f)
    make_tiny_tokenizer(str(path), vocab_size=128)
    rng = np.random.RandomState(7)
    c = DSQ_CFG
    H, V = c['hidden_size'], c['vocab_size']
    nh, dn, dr, dv, r = (c['num_attention_heads'], c['qk_nope_head_dim'],
                         c['qk_rope_head_dim'], c['v_head_dim'],
                         c['kv_lora_rank'])
    t = {
        'model.embed_tokens.weight': (rng.randn(V, H) * 0.02).astype(np.float32),
        'model.norm.weight': np.ones(H, np.float32),
        'lm_head.weight': (rng.randn(V, H) * 0.02).astype(np.float32),
    }

    def fp8_pair(prefix, out_dim, in_dim, scale=0.05):
        w = (rng.randn(out_dim, in_dim) * scale).astype(np.float32)
        w8, s = _quantize_blocked(w, 32, 32)
        t[prefix + '.weight'] = w8
        t[prefix + '.weight_scale_inv'] = s

    for l in range(c['num_hidden_layers']):
        p = f'model.layers.{l}.'
        t[p + 'input_layernorm.weight'] = np.ones(H, np.float32)
        t[p + 'post_attention_layernorm.weight'] = np.ones(H, np.float32)
        fp8_pair(p + 'self_attn.q_proj', nh * (dn + dr), H)
        fp8_pair(p + 'self_attn.kv_a_proj_with_mqa', r + dr, H)
        t[p + 'self_attn.kv_a_layernorm.weight'] = np.ones(r, np.float32)
        fp8_pair(p + 'self_attn.kv_b_proj', nh * (dn + dv), r)
        fp8_pair(p + 'self_attn.o_proj', H, nh * dv)
        if l < c['first_k_dense_replace']:
            I = c['intermediate_size']
            fp8_pair(p + 'mlp.gate_proj', I, H)
            fp8_pair(p + 'mlp.up_proj', I, H)
            fp8_pair(p + 'mlp.down_proj', H, I)
        else:
            E, Ie = c['n_routed_experts'], c['moe_intermediate_size']
            t[p + 'mlp.gate.weight'] = (rng.randn(E, H) * 0.05).astype(np.float32)
            t[p + 'mlp.gate.e_score_correction_bias'] = np.zeros(E, np.float32)
            for e in range(E):
                q = p + f'mlp.experts.{e}.'
                fp8_pair(q + 'gate_proj', Ie, H, 0.2)
                fp8_pair(q + 'up_proj', Ie, H, 0.2)
                fp8_pair(q + 'down_proj', H, Ie, 0.2)
            Is = c['n_shared_experts'] * Ie
            q = p + 'mlp.shared_experts.'
            fp8_pair(q + 'gate_proj', Is, H)
            fp8_pair(q + 'up_proj', Is, H)
            fp8_pair(q + 'down_proj', H, Is)
    t = {k: np.ascontiguousarray(v) for k, v in t.items()}
    save_file(t, str(path / 'model.safetensors'))
    return str(path)


def _greedy(eng, sid, prompt, n=12):
    import asyncio

    from lmdeploy_tpu.messages import GenerationConfig

    async def run():
        inst = eng.create_instance()
        out = await inst.async_infer(sid, prompt, GenerationConfig(
            max_new_tokens=n, ignore_eos=True))
        await inst.async_end(sid)
        return list(out.token_ids)
    loop = asyncio.new_event_loop()
    try:
        return loop.run_until_complete(run())
    finally:
        loop.close()


def _engine(model_dir):
    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import TpuEngineConfig

    return Engine.from_pretrained(
        model_dir,
        TpuEngineConfig(dtype='bfloat16', block_size=16, num_gpu_blocks=64,
                        max_batch_size=4, session_len=256,
                        max_prefill_token_num=64))


def _tree_bytes(leaf):
    return sum(x.nbytes for x in jax.tree_util.tree_leaves(leaf))


def test_deepseek_fp8_resident_experts_token_exact(ds_fp8_dir, monkeypatch):
    """Expert stacks stay fp8 on device; generation is token-exact vs the
    dequantize-at-load twin; the HBM expert footprint shrinks ~2x."""
    eng = _engine(ds_fp8_dir)
    try:
        moe = eng.model_agent.host_params()['moe_layers']
        assert isinstance(moe['we_gate'], dict)
        assert moe['we_gate']['w8'].dtype == jnp.float8_e4m3fn
        assert float(jnp.abs(moe['we_gate']['w8'].astype(jnp.float32)).max()) > 0
        quant_bytes = sum(_tree_bytes(moe[k])
                          for k in ('we_gate', 'we_up', 'we_down'))
        got = [_greedy(eng, 1, [5, 17, 42, 99]),
               _greedy(eng, 2, [3, 9, 11])]
    finally:
        eng.close()

    monkeypatch.setenv('LMDEPLOY_TPU_FP8_DEQUANT', '1')
    ref = _engine(ds_fp8_dir)
    try:
        moe = ref.model_agent.host_params()['moe_layers']
        assert not isinstance(moe['we_gate'], dict)
        dense_bytes = sum(_tree_bytes(moe[k])
                          for k in ('we_gate', 'we_up', 'we_down'))
        want = [_greedy(ref, 1, [5, 17, 42, 99]),
                _greedy(ref, 2, [3, 9, 11])]
    finally:
        ref.close()

    assert got == want
    # fp8 + expanded group scales ≈ (1 + 4/32) bytes/elem vs 2 (bf16)
    assert quant_bytes < 0.65 * dense_bytes, (quant_bytes, dense_bytes)


# -- gpt-oss MXFP4-resident experts e2e ----------------------------------------------

GPTOSS_Q_CFG = {
    'architectures': ['GptOssForCausalLM'],
    'model_type': 'gpt_oss',
    'hidden_size': 64,
    'intermediate_size': 64,
    'num_hidden_layers': 2,
    'num_attention_heads': 4,
    'num_key_value_heads': 2,
    'head_dim': 16,
    'vocab_size': 128,
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
    'torch_dtype': 'bfloat16',
    'quantization_config': {'quant_method': 'mxfp4',
                            'modules_to_not_convert': []},
}


@pytest.fixture(scope='module')
def gptoss_mxfp4_dir(tmp_path_factory):
    """Tiny gpt-oss checkpoint with MXFP4 expert tensors."""
    from safetensors.numpy import save_file

    path = tmp_path_factory.mktemp('tiny_gptoss_mxfp4')
    with open(path / 'config.json', 'w') as f:
        json.dump(GPTOSS_Q_CFG, f)
    make_tiny_tokenizer(str(path), vocab_size=128)
    rng = np.random.RandomState(13)
    c = GPTOSS_Q_CFG
    H, V, E = c['hidden_size'], c['vocab_size'], c['num_local_experts']
    Ie = c['intermediate_size']
    nh, nkv, hd = (c['num_attention_heads'], c['num_key_value_heads'],
                   c['head_dim'])
    t = {
        'model.embed_tokens.weight': (rng.randn(V, H) * 0.02).astype(np.float32),
        'model.norm.weight': np.ones(H, np.float32),
        'lm_head.weight': (rng.randn(V, H) * 0.02).astype(np.float32),
    }
    for l in range(c['num_hidden_layers']):
        p = f'model.layers.{l}.'
        t[p + 'input_layernorm.weight'] = np.ones(H, np.float32)
        t[p + 'post_attention_layernorm.weight'] = np.ones(H, np.float32)
        for hf, od in (('q_proj', nh * hd), ('k_proj', nkv * hd),
                       ('v_proj', nkv * hd)):
            t[p + f'self_attn.{hf}.weight'] = \
                (rng.randn(od, H) * 0.05).astype(np.float32)
            t[p + f'self_attn.{hf}.bias'] = np.zeros(od, np.float32)
        t[p + 'self_attn.o_proj.weight'] = \
            (rng.randn(H, nh * hd) * 0.05).astype(np.float32)
        t[p + 'self_attn.o_proj.bias'] = np.zeros(H, np.float32)
        t[p + 'self_attn.sinks'] = (rng.randn(nh) * 0.1).astype(np.float32)
        t[p + 'mlp.router.weight'] = (rng.randn(E, H) * 0.05).astype(np.float32)
        t[p + 'mlp.router.bias'] = np.zeros(E, np.float32)
        # MXFP4 expert tensors: random e2m1 codes + ue8m0 scales
        t[p + 'mlp.experts.gate_up_proj_blocks'] = \
            rng.randint(0, 256, size=(E, 2 * Ie, H // 32, 16)).astype(np.uint8)
        t[p + 'mlp.experts.gate_up_proj_scales'] = \
            rng.randint(121, 125, size=(E, 2 * Ie, H // 32)).astype(np.uint8)
        t[p + 'mlp.experts.gate_up_proj_bias'] = \
            (rng.randn(E, 2 * Ie) * 0.1).astype(np.float32)
        t[p + 'mlp.experts.down_proj_blocks'] = \
            rng.randint(0, 256, size=(E, H, Ie // 32, 16)).astype(np.uint8)
        t[p + 'mlp.experts.down_proj_scales'] = \
            rng.randint(121, 125, size=(E, H, Ie // 32)).astype(np.uint8)
        t[p + 'mlp.experts.down_proj_bias'] = \
            (rng.randn(E, H) * 0.1).astype(np.float32)
    t = {k: np.ascontiguousarray(v) for k, v in t.items()}
    save_file(t, str(path / 'model.safetensors'))
    return str(path)


def test_gptoss_mxfp4_resident_experts_token_exact(gptoss_mxfp4_dir,
                                                   monkeypatch):
    eng = _engine(gptoss_mxfp4_dir)
    try:
        lay = eng.model_agent.host_params()['layers']
        assert isinstance(lay['we_gate'], dict)
        assert lay['we_gate']['nib'].dtype == jnp.uint8
        quant_bytes = sum(_tree_bytes(lay[k])
                          for k in ('we_gate', 'we_up', 'we_down'))
        got = [_greedy(eng, 1, [5, 17, 42, 99]),
               _greedy(eng, 2, [3, 9, 11])]
    finally:
        eng.close()

    monkeypatch.setenv('LMDEPLOY_TPU_MXFP4_DEQUANT', '1')
    ref = _engine(gptoss_mxfp4_dir)
    try:
        lay = ref.model_agent.host_params()['layers']
        assert not isinstance(lay['we_gate'], dict)
        dense_bytes = sum(_tree_bytes(lay[k])
                          for k in ('we_gate', 'we_up', 'we_down'))
        want = [_greedy(ref, 1, [5, 17, 42, 99]),
                _greedy(ref, 2, [3, 9, 11])]
    finally:
        ref.close()

    assert got == want
    # 0.5 b nibbles + f32/32 scales = 0.625 B/elem vs 2 (bf16)
    assert quant_bytes < 0.4 * dense_bytes, (quant_bytes, dense_bytes)
