"""InternS1-Pro: qwen3-vl tower + qwen3-moe LM + time-series modality.

Reference: lmdeploy/pytorch/models/interns1_pro.py + interns1_pro_time_series.py.
Goldens: (a) the LM path is a stock Qwen3-MoE — greedy tokens must match a
Qwen3MoeForCausalLM twin built from the same tensors; (b) the time-series
tower matches a torch twin assembled from torch primitives per the reference
semantics; (c) TS features inject at the placeholder through the real engine.
"""
import asyncio
import json
import os

import numpy as np
import pytest

H, I, V, E, NH, NKV, HD, L = 64, 96, 128, 4, 4, 2, 16, 2
TS_CFG = {
    'd_model': 32, 'num_mel_bins': 80, 'max_source_positions': 64,
    'scale_embedding': False, 'encoder_layers': 2,
    'encoder_attention_heads': 4, 'encoder_ffn_dim': 64,
    'activation_function': 'gelu', 'ts_adapt_in_dim': 256,
    'ts_adapt_out_dim': 48, 'ts_hidden_dim': 48, 'out_hidden_size': H,
}
VIS_CFG = {
    'depth': 2, 'hidden_size': 32, 'num_heads': 2, 'patch_size': 4,
    'spatial_merge_size': 2, 'temporal_patch_size': 1, 'in_channels': 3,
    'intermediate_size': 48, 'out_hidden_size': H,
    'num_position_embeddings': 16,
}
TEXT_CFG = {
    'architectures': ['Qwen3MoeForCausalLM'], 'model_type': 'qwen3_moe',
    'hidden_size': H, 'intermediate_size': I, 'num_hidden_layers': L,
    'num_attention_heads': NH, 'num_key_value_heads': NKV, 'head_dim': HD,
    'vocab_size': V, 'max_position_embeddings': 256,
    'num_experts': E, 'num_experts_per_tok': 2, 'moe_intermediate_size': 48,
    'norm_topk_prob': True, 'rms_norm_eps': 1e-6, 'rope_theta': 10000.0,
    'eos_token_id': 2, 'tie_word_embeddings': False,
    'torch_dtype': 'float32',
}
TS_TOKEN_ID = 125


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
        t[p + 'mlp.gate.weight'] = rng.randn(E, H) * 0.02
        for e in range(E):
            q = p + f'mlp.experts.{e}.'
            t[q + 'gate_proj.weight'] = rng.randn(48, H) * 0.05
            t[q + 'up_proj.weight'] = rng.randn(48, H) * 0.05
            t[q + 'down_proj.weight'] = rng.randn(H, 48) * 0.05
    return t


def _torch_ts_twin(seed=3):
    """Torch modules per the reference time-series tower semantics."""
    import torch
    torch.manual_seed(seed)
    d = TS_CFG['d_model']

    class Twin(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = torch.nn.Conv1d(1, 128, 5, padding=2)
            layer = torch.nn.TransformerEncoderLayer(d_model=128, nhead=8)
            self.transformer_encoder = torch.nn.TransformerEncoder(layer, 1)
            self.adapt_in = torch.nn.Linear(TS_CFG['ts_adapt_in_dim'], 80)
            self.conv1 = torch.nn.Conv1d(80, d, 3, padding=1)
            self.conv2 = torch.nn.Conv1d(d, d, 3, stride=2, padding=1)
            self.embed_positions = torch.nn.Embedding(
                TS_CFG['max_source_positions'], d)
            self.enc_layers = torch.nn.ModuleList()
            for _ in range(TS_CFG['encoder_layers']):
                m = torch.nn.ModuleDict({
                    'ln1': torch.nn.LayerNorm(d),
                    'q': torch.nn.Linear(d, d), 'k': torch.nn.Linear(d, d),
                    'v': torch.nn.Linear(d, d), 'o': torch.nn.Linear(d, d),
                    'ln2': torch.nn.LayerNorm(d),
                    'f1': torch.nn.Linear(d, TS_CFG['encoder_ffn_dim']),
                    'f2': torch.nn.Linear(TS_CFG['encoder_ffn_dim'], d),
                })
                self.enc_layers.append(m)
            self.layer_norm = torch.nn.LayerNorm(d)
            self.adapt_out = torch.nn.Linear(d, TS_CFG['ts_adapt_out_dim'])
            self.proj_ln = torch.nn.LayerNorm(TS_CFG['ts_hidden_dim'])
            self.proj1 = torch.nn.Linear(TS_CFG['ts_hidden_dim'],
                                         TS_CFG['out_hidden_size'])
            self.proj2 = torch.nn.Linear(TS_CFG['out_hidden_size'],
                                         TS_CFG['out_hidden_size'])

        def _pos128(self, n):
            import math
            pe = torch.zeros(n, 128)
            pos = torch.arange(n, dtype=torch.float32).unsqueeze(1)
            div = torch.exp(torch.arange(0, 128, 2, dtype=torch.float32)
                            * (-math.log(10000.0) / 128))
            pe[:, 0::2] = torch.sin(pos * div)
            pe[:, 1::2] = torch.cos(pos * div)
            return pe

        def _mha(self, x, q, k, v, o, heads, causal):
            T, B, D = x.shape
            hd = D // heads

            def split(t):
                return t.reshape(T, B, heads, hd).permute(1, 2, 0, 3)

            qq = split(q(x)) / hd ** 0.5
            kk, vv = split(k(x)), split(v(x))
            att = torch.einsum('bhqd,bhkd->bhqk', qq, kk)
            if causal:
                mask = torch.tril(torch.ones(T, T, dtype=torch.bool))
                att = att.masked_fill(~mask, float('-inf'))
            att = att.softmax(-1)
            out = torch.einsum('bhqk,bhkd->bhqd', att, vv)
            return o(out.permute(2, 0, 1, 3).reshape(T, B, D))

        def forward(self, patched):                       # [L, P, C]
            Lp, P, C = patched.shape
            x = patched.permute(0, 2, 1).reshape(Lp * C, 1, P)
            x = torch.relu(self.conv(x))                  # [B*C, 128, P]
            x = x.permute(2, 0, 1)                        # [P, B*C, 128]
            x = x + self._pos128(P).unsqueeze(1)
            x = self.transformer_encoder(x)
            x = x.mean(0).reshape(Lp, C, 128).mean(1)     # [L, 128]
            Le = Lp - Lp % 2
            sub = torch.cat([x[0:Le:2], x[1:Le:2]], dim=-1)   # [L//2, 256]
            h = self.adapt_in(sub.unsqueeze(0))           # [1, T, 80]
            h = h.permute(0, 2, 1)
            h = torch.nn.functional.gelu(self.conv1(h))
            h = torch.nn.functional.gelu(self.conv2(h))
            h = h.permute(0, 2, 1)                        # [1, T', d]
            Tp = h.shape[1]
            h = h + self.embed_positions.weight[:Tp]
            h = h.permute(1, 0, 2)                        # [T', 1, d]
            for m in self.enc_layers:
                r = h
                y = m['ln1'](h)
                y = self._mha(y, m['q'], m['k'], m['v'], m['o'],
                              TS_CFG['encoder_attention_heads'], causal=True)
                h = r + y
                r = h
                y = m['ln2'](h)
                y = m['f2'](torch.nn.functional.gelu(m['f1'](y)))
                h = r + y
            h = self.layer_norm(h)
            h = self.adapt_out(h).permute(1, 0, 2)[0]     # [T', dh]
            h = self.proj_ln(h)
            h = torch.nn.functional.gelu(self.proj1(h))
            return self.proj2(h)                          # [T', H]

    return Twin().float().eval()


def _ts_tensors(twin):
    """Torch twin state -> checkpoint tensors under reference names."""
    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    t = {}
    ee = 'time_series.encoder_embed.'
    tl = ee + 'transformer_encoder.layers.0.'
    en = 'time_series.encoder.'
    pj = 'time_series.projector.'
    t[ee + 'conv.weight'] = sd['conv.weight']
    t[ee + 'conv.bias'] = sd['conv.bias']
    for k in ('self_attn.in_proj_weight', 'self_attn.in_proj_bias',
              'self_attn.out_proj.weight', 'self_attn.out_proj.bias',
              'linear1.weight', 'linear1.bias', 'linear2.weight',
              'linear2.bias', 'norm1.weight', 'norm1.bias', 'norm2.weight',
              'norm2.bias'):
        t[tl + k] = sd['transformer_encoder.layers.0.' + k]
    t[en + 'adapt_in.weight'] = sd['adapt_in.weight']
    t[en + 'adapt_in.bias'] = sd['adapt_in.bias']
    t[en + 'conv1.weight'] = sd['conv1.weight']
    t[en + 'conv1.bias'] = sd['conv1.bias']
    t[en + 'conv2.weight'] = sd['conv2.weight']
    t[en + 'conv2.bias'] = sd['conv2.bias']
    t[en + 'embed_positions.weight'] = sd['embed_positions.weight']
    t[en + 'layer_norm.weight'] = sd['layer_norm.weight']
    t[en + 'layer_norm.bias'] = sd['layer_norm.bias']
    t[en + 'adapt_out.weight'] = sd['adapt_out.weight']
    t[en + 'adapt_out.bias'] = sd['adapt_out.bias']
    for li in range(TS_CFG['encoder_layers']):
        lp = en + f'layers.{li}.'
        src = f'enc_layers.{li}.'
        for ours, theirs in [('self_attn.q_proj', 'q'),
                             ('self_attn.k_proj', 'k'),
                             ('self_attn.v_proj', 'v'),
                             ('self_attn.out_proj', 'o')]:
            t[lp + ours + '.weight'] = sd[src + theirs + '.weight']
            t[lp + ours + '.bias'] = sd[src + theirs + '.bias']
        t[lp + 'self_attn_layer_norm.weight'] = sd[src + 'ln1.weight']
        t[lp + 'self_attn_layer_norm.bias'] = sd[src + 'ln1.bias']
        t[lp + 'final_layer_norm.weight'] = sd[src + 'ln2.weight']
        t[lp + 'final_layer_norm.bias'] = sd[src + 'ln2.bias']
        t[lp + 'fc1.weight'] = sd[src + 'f1.weight']
        t[lp + 'fc1.bias'] = sd[src + 'f1.bias']
        t[lp + 'fc2.weight'] = sd[src + 'f2.weight']
        t[lp + 'fc2.bias'] = sd[src + 'f2.bias']
    t[pj + 'layer_norm.weight'] = sd['proj_ln.weight']
    t[pj + 'layer_norm.bias'] = sd['proj_ln.bias']
    t[pj + 'linear_1.weight'] = sd['proj1.weight']
    t[pj + 'linear_1.bias'] = sd['proj1.bias']
    t[pj + 'linear_2.weight'] = sd['proj2.weight']
    t[pj + 'linear_2.bias'] = sd['proj2.bias']
    return t


@pytest.fixture(scope='module')
def interns1_dir(tmp_path_factory):
    from safetensors.numpy import save_file

    from conftest import make_tiny_tokenizer

    path = tmp_path_factory.mktemp('interns1')
    rng = np.random.RandomState(7)
    lm = _lm_tensors(rng)
    tensors = {'model.language_model.' + k[len('model.'):] if
               k.startswith('model.') else k: v for k, v in lm.items()}
    twin = _torch_ts_twin()
    tensors.update(_ts_tensors(twin))
    # vision tower left zero-init (covered by qwen3_vl golden tests)
    tensors = {k: np.ascontiguousarray(np.asarray(v, np.float32))
               for k, v in tensors.items()}
    save_file(tensors, str(path / 'model.safetensors'))
    cfg = {
        'architectures': ['InternS1ProForConditionalGeneration'],
        'model_type': 'interns1_pro',
        'text_config': {k: v for k, v in TEXT_CFG.items()
                        if k != 'architectures'},
        'vision_config': VIS_CFG,
        'ts_config': TS_CFG,
        'image_token_id': 124,
        'ts_token_id': TS_TOKEN_ID,
        'torch_dtype': 'float32',
    }
    with open(path / 'config.json', 'w') as f:
        json.dump(cfg, f)
    make_tiny_tokenizer(str(path), vocab_size=128)
    # twin LM checkpoint (pure Qwen3Moe)
    twin_path = tmp_path_factory.mktemp('interns1_lm_twin')
    with open(twin_path / 'config.json', 'w') as f:
        json.dump(TEXT_CFG, f)
    save_file({k: np.ascontiguousarray(np.asarray(v, np.float32))
               for k, v in lm.items()}, str(twin_path / 'model.safetensors'))
    make_tiny_tokenizer(str(twin_path), vocab_size=128)
    return str(path), str(twin_path), twin


def _greedy(model_dir, prompt, n, mm_data=None):
    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import GenerationConfig, TpuEngineConfig
    cfg = TpuEngineConfig(dtype='float32', block_size=16, num_gpu_blocks=48,
                          max_batch_size=4, session_len=256,
                          max_prefill_token_num=64)
    eng = Engine.from_pretrained(model_dir, cfg)

    async def run():
        inst = eng.create_instance()
        out = await inst.async_infer(
            31, prompt, GenerationConfig(max_new_tokens=n, ignore_eos=True),
            mm_data=mm_data)
        await inst.async_end(31)
        return list(out.token_ids)

    loop = asyncio.new_event_loop()
    try:
        return loop.run_until_complete(run())
    finally:
        loop.close()
        eng.close()


def test_lm_path_matches_qwen3_moe_twin(interns1_dir):
    path, twin_path, _ = interns1_dir
    rng = np.random.RandomState(1)
    prompt = rng.randint(3, 120, size=11).tolist()
    got = _greedy(path, prompt, 8)
    want = _greedy(twin_path, prompt, 8)
    assert got == want and len(got) == 8


def test_ts_tower_matches_torch_twin(interns1_dir):
    import torch

    from lmdeploy_tpu.config import ModelConfig
    from lmdeploy_tpu.models import build_model
    from lmdeploy_tpu.models.interns1_pro import ts_patch
    from lmdeploy_tpu.weight_loader import load_params_np

    path, _, twin = interns1_dir
    cfg = ModelConfig.from_pretrained(path, dtype='float32')
    model = build_model(cfg)
    assert model.ts_tower is not None and model.uses_mrope is False
    params = load_params_np(model, path)

    rng = np.random.RandomState(5)
    sig = rng.randn(2000, 2).astype(np.float32)
    patched, n_tokens = ts_patch(sig, sr=100.0)
    with torch.no_grad():
        want = twin(torch.tensor(patched)).numpy()
    import jax.numpy as jnp
    got = np.asarray(model.ts_tower.encode(
        {k: jnp.asarray(v) for k, v in params['ts'].items()},
        jnp.asarray(patched)))
    assert got.shape == want.shape == (n_tokens, H)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_ts_e2e_injection(interns1_dir):
    """TS features inject at the placeholder through the real engine: the
    prompt's single ts token expands to n_tokens and generation runs."""
    path, _, _ = interns1_dir
    rng = np.random.RandomState(9)
    sig = rng.randn(1500, 1).astype(np.float32)
    prompt = [5, 9, TS_TOKEN_ID, 17, 21]
    out1 = _greedy(path, prompt, 6,
                   mm_data=[{'type': 'time_series', 'data': sig,
                             'sampling_rate': 64.0}])
    assert len(out1) == 6
    # deterministic given identical inputs
    out2 = _greedy(path, prompt, 6,
                   mm_data=[{'type': 'time_series', 'data': sig,
                             'sampling_rate': 64.0}])
    assert out1 == out2
    # a different signal must change the continuation with high probability
    sig2 = rng.randn(1500, 1).astype(np.float32) * 3 + 1
    out3 = _greedy(path, prompt, 6,
                   mm_data=[{'type': 'time_series', 'data': sig2,
                             'sampling_rate': 64.0}])
    assert len(out3) == 6
