"""MetaMoE / InternS2-Mobius: shared round-robin expert stacks.

Reference: lmdeploy/pytorch/models/meta_moe.py (layer L routes through meta
block ``L % num_meta_moe_blocks``; checkpoint names meta_experts.{i} /
meta_experts_gate.{i}) and interns2_mobius.py (same compute graph under the
InternS2Mobius arch names).  Goldenness is by construction: a MetaMoE
checkpoint and a Qwen3_5-MoE checkpoint whose per-layer stacks repeat with
the meta period are mathematically identical, and the Qwen3_5-MoE engine is
itself golden-tested against transformers (test_qwen3_5.py).
"""
import json
import os

import numpy as np
import pytest

from test_qwen3_5 import (GEOM, LAYER_TYPES, _engine, _gen, _load_sd,
                          _split_linear_attn)

L8 = 8                                   # 2 blocks of interval 4
NM = 4                                   # meta blocks
E = GEOM['num_experts']
I_MOE = GEOM['moe_intermediate_size']


@pytest.fixture(scope='module')
def next8_src_dir(tmp_path_factory):
    """Tiny 8-layer transformers Qwen3Next twin (2 full-attention blocks)."""
    import torch
    from transformers.models.qwen3_next import (Qwen3NextConfig,
                                                Qwen3NextForCausalLM)

    from conftest import make_tiny_tokenizer

    path = str(tmp_path_factory.mktemp('meta_src'))
    cfg = Qwen3NextConfig(full_attention_interval=4, decoder_sparse_step=1,
                          mlp_only_layers=[],
                          **dict(GEOM, num_hidden_layers=L8))
    torch.manual_seed(23)
    model = Qwen3NextForCausalLM(cfg).float().eval()
    model.save_pretrained(path, safe_serialization=True)
    make_tiny_tokenizer(path, vocab_size=128)
    return path


def _write(sd, out_dir, arch, model_type, meta: bool):
    """Write either the repeated-stack qwen3_5_moe twin (meta=False) or the
    MetaMoE checkpoint (meta=True) from the same 8-layer state dict.  Both
    use the stacks/routers of layers 0..NM-1 for layer L via L % NM."""
    from safetensors.numpy import save_file

    from conftest import make_tiny_tokenizer

    layer_types = LAYER_TYPES * (L8 // 4)
    out = {}
    for name, w in sd.items():
        if not name.startswith('model.layers.'):
            if name == 'lm_head.weight':
                out[name] = w
            elif name.startswith('model.'):
                out['model.language_model.' + name[len('model.'):]] = w
            continue
        l = int(name.split('.')[2])
        rest = name.split('.', 3)[3]
        if rest.startswith('linear_attn.in_proj'):
            continue
        if '.experts.' in rest or rest == 'mlp.gate.weight':
            continue                      # expert stacks handled below
        out[f'model.language_model.layers.{l}.' + rest] = w
    for l in range(L8):
        if layer_types[l] == 'linear_attention':
            for k, w in _split_linear_attn(sd, l).items():
                out[f'model.language_model.layers.{l}.linear_attn.{k}'] = w

    def stack(src_layer):
        src = f'model.layers.{src_layer}.mlp.experts.'
        gu = np.stack([np.concatenate(
            [sd[src + f'{e}.gate_proj.weight'],
             sd[src + f'{e}.up_proj.weight']], axis=0)
            for e in range(E)])                         # [E, 2I, H]
        dn = np.stack([sd[src + f'{e}.down_proj.weight']
                       for e in range(E)])              # [E, H, I]
        gate = sd[f'model.layers.{src_layer}.mlp.gate.weight']
        return gu, dn, gate

    if meta:
        for i in range(NM):
            gu, dn, gate = stack(i)
            b = f'model.language_model.meta_experts.{i}.'
            out[b + 'gate_up_proj'] = gu
            out[b + 'down_proj'] = dn
            out[f'model.language_model.meta_experts_gate.{i}.weight'] = gate
    else:
        for l in range(L8):
            gu, dn, gate = stack(l % NM)
            dst = f'model.language_model.layers.{l}.mlp.'
            out[dst + 'experts.gate_up_proj'] = gu
            out[dst + 'experts.down_proj'] = dn
            out[dst + 'gate.weight'] = gate

    os.makedirs(out_dir, exist_ok=True)
    save_file(out, os.path.join(out_dir, 'model.safetensors'))
    text_cfg = dict(GEOM, num_hidden_layers=L8, layer_types=layer_types,
                    rope_scaling={'rope_type': 'default',
                                  'mrope_section': [2, 1, 1],
                                  'mrope_interleaved': True})
    if meta:
        text_cfg['num_meta_moe_blocks'] = NM
    cfg = {'architectures': [arch], 'model_type': model_type,
           'text_config': text_cfg, 'torch_dtype': 'float32'}
    with open(os.path.join(out_dir, 'config.json'), 'w') as f:
        json.dump(cfg, f)
    make_tiny_tokenizer(out_dir, vocab_size=128)
    return out_dir


@pytest.mark.parametrize('arch,model_type', [
    ('MetaMoeForConditionalGeneration', 'qwen3_5_moe'),
    ('InternS2MobiusForConditionalGeneration', 'interns2_mobius'),
])
def test_meta_moe_matches_repeated_stack_twin(next8_src_dir, tmp_path, arch,
                                              model_type):
    """MetaMoE greedy tokens == the qwen3_5_moe twin whose per-layer expert
    stacks repeat with the meta period (bit-identical compute by design)."""
    sd = _load_sd(next8_src_dir)
    twin = _write(sd, str(tmp_path / 'twin'),
                  'Qwen3_5MoeForConditionalGeneration', 'qwen3_5_moe',
                  meta=False)
    metad = _write(sd, str(tmp_path / 'meta'), arch, model_type, meta=True)

    rng = np.random.RandomState(5)
    prompt = rng.randint(3, 120, size=12).tolist()

    eng = _engine(twin)
    try:
        want = _gen(eng, 11, prompt, 8)
    finally:
        eng.close()
    eng = _engine(metad)
    try:
        got = _gen(eng, 12, prompt, 8)
    finally:
        eng.close()
    assert got == want and len(got) == 8


def test_meta_registry_roundrobin_weights(next8_src_dir, tmp_path):
    """The loader lands meta stacks in the shared meta_mlp group and layers
    4..7 genuinely reuse blocks 0..3 (perturbing meta block 1 changes layers
    1 AND 5)."""
    from lmdeploy_tpu.config import ModelConfig
    from lmdeploy_tpu.models import build_model
    from lmdeploy_tpu.weight_loader import load_params_np

    sd = _load_sd(next8_src_dir)
    metad = _write(sd, str(tmp_path / 'meta2'),
                   'MetaMoeForConditionalGeneration', 'qwen3_5_moe',
                   meta=True)
    cfg = ModelConfig.from_pretrained(metad, dtype='float32')
    model = build_model(cfg)
    assert getattr(model, 'n_meta', 0) == NM
    params = load_params_np(model, metad)
    assert 'meta_mlp' in params
    assert params['meta_mlp']['we_gate'].shape == (
        NM, E, GEOM['hidden_size'], I_MOE)
    # stacks match the source layers 0..NM-1
    src = sd['model.layers.2.mlp.experts.1.gate_proj.weight']
    np.testing.assert_allclose(params['meta_mlp']['we_gate'][2, 1], src.T,
                               rtol=1e-6)
