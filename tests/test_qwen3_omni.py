"""Qwen3-Omni MoE thinker: AuT audio tower + qwen3-vl vision + qwen3-moe LM.

Reference: lmdeploy/pytorch/models/qwen3_omni_moe_thinker.py.  Goldens: LM
path vs a Qwen3-MoE twin of the same tensors; audio tower vs a torch twin of
the documented semantics (chunked stride-2 conv2d stack, per-chunk sinusoid
positions, block-diagonal pre-LN encoder, ln_post + projector); e2e audio
injection (waveform -> log-mel -> features at the placeholder).
"""
import asyncio
import json
import math
import os

import numpy as np
import pytest

H, I, V, NH, NKV, HD, L = 64, 96, 128, 4, 2, 16, 2
AUDIO = {
    'd_model': 32, 'num_mel_bins': 32, 'max_source_positions': 128,
    'encoder_layers': 2, 'encoder_attention_heads': 4,
    'encoder_ffn_dim': 64, 'downsample_hidden_size': 16,
    'n_window': 8, 'n_window_infer': 32, 'output_dim': H,
    'activation_function': 'gelu', 'conv_chunksize': 500,
    'scale_embedding': False,
}
VIS_CFG = {
    'depth': 2, 'hidden_size': 32, 'num_heads': 2, 'patch_size': 4,
    'spatial_merge_size': 2, 'temporal_patch_size': 1, 'in_channels': 3,
    'intermediate_size': 48, 'out_hidden_size': H,
    'num_position_embeddings': 16, 'deepstack_visual_indexes': [],
}
TEXT_CFG = {
    'architectures': ['Qwen3MoeForCausalLM'], 'model_type': 'qwen3_moe',
    'hidden_size': H, 'intermediate_size': I, 'num_hidden_layers': L,
    'num_attention_heads': NH, 'num_key_value_heads': NKV, 'head_dim': HD,
    'vocab_size': V, 'max_position_embeddings': 256,
    'num_experts': 4, 'num_experts_per_tok': 2, 'moe_intermediate_size': 48,
    'norm_topk_prob': True, 'rms_norm_eps': 1e-6, 'rope_theta': 10000.0,
    'eos_token_id': 2, 'tie_word_embeddings': False,
    'torch_dtype': 'float32',
}
AUDIO_TOKEN = 121


def _lm_tensors(rng):
    t = {
        'model.embed_tokens.weight': rng.randn(V, H) * 0.02,
        'model.norm.weight': np.ones(H),
        'lm_head.weight': rng.randn(V, H) * 0.02,
    }
    for l in range(L):
        p = f'model.layers.{l}.'
        t[p + 'input_layernorm.weight'] = np.ones(H)
        t[p + 'post_attention_layernorm.weight'] = np.ones(H)
        t[p + 'self_attn.q_proj.weight'] = rng.randn(NH * HD, H) * 0.02
        t[p + 'self_attn.k_proj.weight'] = rng.randn(NKV * HD, H) * 0.02
        t[p + 'self_attn.v_proj.weight'] = rng.randn(NKV * HD, H) * 0.02
        t[p + 'self_attn.o_proj.weight'] = rng.randn(H, NH * HD) * 0.02
        t[p + 'self_attn.q_norm.weight'] = np.ones(HD)
        t[p + 'self_attn.k_norm.weight'] = np.ones(HD)
        t[p + 'mlp.gate.weight'] = rng.randn(4, H) * 0.02
        for e in range(4):
            q = p + f'mlp.experts.{e}.'
            t[q + 'gate_proj.weight'] = rng.randn(48, H) * 0.05
            t[q + 'up_proj.weight'] = rng.randn(48, H) * 0.05
            t[q + 'down_proj.weight'] = rng.randn(H, 48) * 0.05
    return t


def _audio_tensors(rng):
    d, dn, ffn = AUDIO['d_model'], AUDIO['downsample_hidden_size'], \
        AUDIO['encoder_ffn_dim']
    f = AUDIO['num_mel_bins']
    for _ in range(3):
        f = (f + 1) // 2
    t = {
        'audio_tower.conv2d1.weight': rng.randn(dn, 1, 3, 3) * 0.1,
        'audio_tower.conv2d1.bias': rng.randn(dn) * 0.01,
        'audio_tower.conv2d2.weight': rng.randn(dn, dn, 3, 3) * 0.1,
        'audio_tower.conv2d2.bias': rng.randn(dn) * 0.01,
        'audio_tower.conv2d3.weight': rng.randn(dn, dn, 3, 3) * 0.1,
        'audio_tower.conv2d3.bias': rng.randn(dn) * 0.01,
        'audio_tower.conv_out.weight': rng.randn(d, dn * f) * 0.05,
        'audio_tower.ln_post.weight': np.ones(d) + rng.randn(d) * 0.01,
        'audio_tower.ln_post.bias': rng.randn(d) * 0.01,
        'audio_tower.proj1.weight': rng.randn(d, d) * 0.05,
        'audio_tower.proj1.bias': rng.randn(d) * 0.01,
        'audio_tower.proj2.weight': rng.randn(H, d) * 0.05,
        'audio_tower.proj2.bias': rng.randn(H) * 0.01,
    }
    for li in range(AUDIO['encoder_layers']):
        b = f'audio_tower.layers.{li}.'
        t[b + 'self_attn.qkv_proj.weight'] = rng.randn(3 * d, d) * 0.05
        t[b + 'self_attn.qkv_proj.bias'] = rng.randn(3 * d) * 0.01
        t[b + 'self_attn.out_proj.weight'] = rng.randn(d, d) * 0.05
        t[b + 'self_attn.out_proj.bias'] = rng.randn(d) * 0.01
        t[b + 'self_attn_layer_norm.weight'] = np.ones(d) + rng.randn(d) * 0.01
        t[b + 'self_attn_layer_norm.bias'] = rng.randn(d) * 0.01
        t[b + 'final_layer_norm.weight'] = np.ones(d) + rng.randn(d) * 0.01
        t[b + 'final_layer_norm.bias'] = rng.randn(d) * 0.01
        t[b + 'fc1.weight'] = rng.randn(ffn, d) * 0.05
        t[b + 'fc1.bias'] = rng.randn(ffn) * 0.01
        t[b + 'fc2.weight'] = rng.randn(d, ffn) * 0.05
        t[b + 'fc2.bias'] = rng.randn(d) * 0.01
    return t


@pytest.fixture(scope='module')
def omni_dir(tmp_path_factory):
    from safetensors.numpy import save_file

    from conftest import make_tiny_tokenizer

    path = tmp_path_factory.mktemp('omni')
    rng = np.random.RandomState(33)
    lm = _lm_tensors(rng)
    tensors = {}
    for k, v in lm.items():
        nk = ('thinker.model.language_model.' + k[len('model.'):]
              if k.startswith('model.') else 'thinker.' + k)
        tensors[nk] = v
    tensors.update({'thinker.' + k: v for k, v in _audio_tensors(rng).items()})
    tensors = {k: np.ascontiguousarray(np.asarray(v, np.float32))
               for k, v in tensors.items()}
    save_file(tensors, str(path / 'model.safetensors'))

    cfg = {
        'architectures': ['Qwen3OmniMoeForConditionalGeneration'],
        'model_type': 'qwen3_omni_moe',
        'thinker_config': {
            'model_type': 'qwen3_omni_moe_thinker',
            'text_config': dict(
                {k: v for k, v in TEXT_CFG.items() if k != 'architectures'},
                rope_scaling={'rope_type': 'default',
                              'mrope_section': [4, 2, 2],
                              'mrope_interleaved': True}),
            'vision_config': VIS_CFG,
            'audio_config': AUDIO,
            'image_token_id': 120,
            'audio_token_id': AUDIO_TOKEN,
        },
        'torch_dtype': 'float32',
    }
    with open(path / 'config.json', 'w') as f:
        json.dump(cfg, f)
    make_tiny_tokenizer(str(path), vocab_size=128)

    twin = tmp_path_factory.mktemp('omni_lm_twin')
    with open(twin / 'config.json', 'w') as f:
        json.dump(TEXT_CFG, f)
    save_file({k: np.ascontiguousarray(np.asarray(v, np.float32))
               for k, v in lm.items()}, str(twin / 'model.safetensors'))
    make_tiny_tokenizer(str(twin), vocab_size=128)
    return str(path), str(twin)


def _greedy(model_dir, prompt, n, mm_data=None):
    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import GenerationConfig, TpuEngineConfig
    cfg = TpuEngineConfig(dtype='float32', block_size=16, num_gpu_blocks=64,
                          max_batch_size=4, session_len=320,
                          max_prefill_token_num=128)
    eng = Engine.from_pretrained(model_dir, cfg)

    async def run():
        inst = eng.create_instance()
        out = await inst.async_infer(
            81, prompt, GenerationConfig(max_new_tokens=n, ignore_eos=True),
            mm_data=mm_data)
        await inst.async_end(81)
        return list(out.token_ids)

    loop = asyncio.new_event_loop()
    try:
        return loop.run_until_complete(run())
    finally:
        loop.close()
        eng.close()


def test_lm_path_matches_qwen3_moe_twin(omni_dir):
    path, twin = omni_dir
    rng = np.random.RandomState(2)
    prompt = rng.randint(3, 119, size=10).tolist()
    assert _greedy(path, prompt, 8) == _greedy(twin, prompt, 8)


def test_audio_tower_matches_torch_twin(omni_dir):
    import torch
    from safetensors.numpy import load_file

    from lmdeploy_tpu.config import ModelConfig
    from lmdeploy_tpu.models import build_model
    from lmdeploy_tpu.weight_loader import load_params_np

    path, _ = omni_dir
    cfg = ModelConfig.from_pretrained(path, dtype='float32')
    model = build_model(cfg)
    params = load_params_np(model, path)
    rng = np.random.RandomState(7)
    T = 70                                     # 5 chunks of 16, last is 6
    mel = rng.randn(AUDIO['num_mel_bins'], T).astype(np.float32)
    import jax
    got = np.asarray(model.audio_tower.encode(
        jax.tree_util.tree_map(lambda x: x, params['audio']), mel))

    sd = load_file(os.path.join(path, 'model.safetensors'))
    a = 'thinker.audio_tower.'
    d = AUDIO['d_model']
    heads = AUDIO['encoder_attention_heads']
    hd = d // heads
    win = AUDIO['n_window'] * 2
    with torch.no_grad():
        n_chunks = math.ceil(T / win)
        mel_p = np.pad(mel, ((0, 0), (0, n_chunks * win - T)))
        chunks = torch.tensor(mel_p.T.reshape(n_chunks, win,
                                              AUDIO['num_mel_bins'])
                              .transpose(0, 2, 1))[:, None]
        x = chunks
        for ci in ('conv2d1', 'conv2d2', 'conv2d3'):
            x = torch.nn.functional.gelu(torch.nn.functional.conv2d(
                x, torch.tensor(sd[a + ci + '.weight']),
                torch.tensor(sd[a + ci + '.bias']), stride=2, padding=1))
        b, c, f, t = x.shape
        x = x.permute(0, 3, 1, 2).reshape(b, t, c * f) \
            @ torch.tensor(sd[a + 'conv_out.weight']).T
        half = d // 2
        inc = math.log(10000) / (half - 1)
        inv = torch.exp(-inc * torch.arange(half, dtype=torch.float32))
        st = torch.arange(t, dtype=torch.float32)[:, None] * inv[None]
        x = x + torch.cat([st.sin(), st.cos()], dim=1)[None]
        lens = []
        for i in range(n_chunks):
            v = win if (i < n_chunks - 1 or T % win == 0) else T % win
            for _ in range(3):
                v = (v - 1) // 2 + 1
            lens.append(v)
        rows = torch.cat([x[i, :v] for i, v in enumerate(lens)], dim=0)
        Lr = rows.shape[0]
        window = t * max(AUDIO['n_window_infer'] // win, 1)
        blk = torch.arange(Lr) // window
        mask = blk[:, None] == blk[None, :]

        def ln(v, wk, bk):
            return torch.nn.functional.layer_norm(
                v, (v.shape[-1],), torch.tensor(sd[a + wk]),
                torch.tensor(sd[a + bk]), eps=1e-5)

        h = rows
        for li in range(AUDIO['encoder_layers']):
            b2 = f'layers.{li}.'
            r = h
            y = ln(h, b2 + 'self_attn_layer_norm.weight',
                   b2 + 'self_attn_layer_norm.bias')
            qkv = y @ torch.tensor(sd[a + b2 + 'self_attn.qkv_proj.weight']).T \
                + torch.tensor(sd[a + b2 + 'self_attn.qkv_proj.bias'])
            q, k, v = qkv.chunk(3, -1)

            def sp(tt):
                return tt.reshape(Lr, heads, hd).permute(1, 0, 2)

            att = (sp(q) @ sp(k).transpose(-1, -2)) / math.sqrt(hd)
            att = att.masked_fill(~mask[None], float('-inf')).softmax(-1)
            o = (att @ sp(v)).permute(1, 0, 2).reshape(Lr, d)
            h = r + o @ torch.tensor(
                sd[a + b2 + 'self_attn.out_proj.weight']).T + torch.tensor(
                sd[a + b2 + 'self_attn.out_proj.bias'])
            r = h
            y = ln(h, b2 + 'final_layer_norm.weight',
                   b2 + 'final_layer_norm.bias')
            y = torch.nn.functional.gelu(
                y @ torch.tensor(sd[a + b2 + 'fc1.weight']).T
                + torch.tensor(sd[a + b2 + 'fc1.bias']))
            y = y @ torch.tensor(sd[a + b2 + 'fc2.weight']).T \
                + torch.tensor(sd[a + b2 + 'fc2.bias'])
            h = r + y
        h = ln(h, 'ln_post.weight', 'ln_post.bias')
        h = torch.nn.functional.gelu(
            h @ torch.tensor(sd[a + 'proj1.weight']).T
            + torch.tensor(sd[a + 'proj1.bias']))
        want = (h @ torch.tensor(sd[a + 'proj2.weight']).T
                + torch.tensor(sd[a + 'proj2.bias'])).numpy()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_e2e_audio_injection(omni_dir):
    path, _ = omni_dir
    rng = np.random.RandomState(4)
    wave = (rng.randn(16000) * 0.1).astype(np.float32)   # 1s of noise
    prompt = [5, 9, AUDIO_TOKEN, 17, 21]
    item = {'type': 'audio', 'data': wave, 'sampling_rate': 16000}
    out = _greedy(path, prompt, 6, mm_data=[item])
    assert len(out) == 6
    assert out == _greedy(path, prompt, 6, mm_data=[item])
    # mel passthrough also works
    from lmdeploy_tpu.models.qwen3_omni import log_mel_spectrogram
    mel = log_mel_spectrogram(wave, n_mels=AUDIO['num_mel_bins'])
    out2 = _greedy(path, prompt, 6,
                   mm_data=[{'type': 'audio', 'data': mel}])
    assert out2 == out
