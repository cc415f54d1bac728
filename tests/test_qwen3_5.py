"""Qwen3.5 family: split-projection gated-DeltaNet VLM vs the golden path.

transformers (4.57) has no qwen3_5 classes, so goldenness is transitive:
a tiny transformers Qwen3NextForCausalLM checkpoint (whose engine support is
golden-tested in test_qwen3_next.py) is mechanically re-laid-out into the
qwen3_5 checkpoint format — split in_proj_qkv/z/b/a instead of the fused
per-key-head qkvz/ba, fused expert stacks, model.language_model nesting —
and the qwen3_5 engine must reproduce transformers' greedy tokens
token-for-token.  The dense variant is pinned against a 1-expert MoE twin
(softmax of one logit = 1, zeroed shared expert), which is exact by
construction.
"""
import asyncio
import json
import os

import numpy as np
import pytest

GEOM = dict(
    hidden_size=64, intermediate_size=96,
    num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
    head_dim=32,
    linear_num_key_heads=2, linear_num_value_heads=4,
    linear_key_head_dim=16, linear_value_head_dim=16,
    linear_conv_kernel_dim=4,
    num_experts=4, num_experts_per_tok=2, moe_intermediate_size=32,
    shared_expert_intermediate_size=48,
    norm_topk_prob=True,
    vocab_size=128, partial_rotary_factor=0.25,
    rope_theta=10000.0, max_position_embeddings=512,
    rms_norm_eps=1e-6, tie_word_embeddings=False,
    bos_token_id=1, eos_token_id=2,
)
HK, HV, DK, DV = 2, 4, 16, 16
R = HV // HK
KD, VD = HK * DK, HV * DV
LAYER_TYPES = ['linear_attention'] * 3 + ['full_attention']

TINY_VISION = dict(
    depth=2, hidden_size=32, num_heads=2, patch_size=4,
    spatial_merge_size=2, temporal_patch_size=1, in_channels=3,
    intermediate_size=48, out_hidden_size=64, num_position_embeddings=16,
)


@pytest.fixture(scope='module')
def next_src_dir(tmp_path_factory):
    """Tiny transformers Qwen3NextForCausalLM checkpoint (the golden twin)."""
    import torch
    from transformers.models.qwen3_next import (Qwen3NextConfig,
                                                Qwen3NextForCausalLM)
    from conftest import make_tiny_tokenizer

    path = str(tmp_path_factory.mktemp('q35_next_src'))
    cfg = Qwen3NextConfig(full_attention_interval=4, decoder_sparse_step=1,
                          mlp_only_layers=[], **GEOM)
    torch.manual_seed(11)
    model = Qwen3NextForCausalLM(cfg).float().eval()
    model.save_pretrained(path, safe_serialization=True)
    make_tiny_tokenizer(path, vocab_size=128)
    return path


def _load_sd(model_dir):
    from safetensors.numpy import load_file
    sd = {}
    for f in os.listdir(model_dir):
        if f.endswith('.safetensors'):
            sd.update(load_file(os.path.join(model_dir, f)))
    return sd


def _split_linear_attn(sd, l):
    """Fused qwen3-next projections -> qwen3_5 split tensors for layer l."""
    p = f'model.layers.{l}.linear_attn.'
    qkvz = sd[p + 'in_proj_qkvz.weight'].reshape(HK, 2 * DK + 2 * R * DV, -1)
    H = qkvz.shape[-1]
    q = qkvz[:, :DK].reshape(KD, H)
    k = qkvz[:, DK:2 * DK].reshape(KD, H)
    v = qkvz[:, 2 * DK:2 * DK + R * DV].reshape(VD, H)
    z = qkvz[:, 2 * DK + R * DV:].reshape(VD, H)
    ba = sd[p + 'in_proj_ba.weight'].reshape(HK, 2 * R, H)
    b = ba[:, :R].reshape(HV, H)
    a = ba[:, R:].reshape(HV, H)
    return {
        'in_proj_qkv.weight': np.concatenate([q, k, v], axis=0),
        'in_proj_z.weight': z,
        'in_proj_b.weight': b,
        'in_proj_a.weight': a,
    }


def _write_qwen3_5(sd, out_dir, arch, model_type, fused_experts=True,
                   dense_mlp=None, with_vision=False):
    """Write a qwen3_5-format checkpoint from a qwen3-next state dict.

    dense_mlp: optional {layer: (gate, up, down)} replacing the MoE mlp.
    """
    from safetensors.numpy import save_file
    from conftest import make_tiny_tokenizer

    L = GEOM['num_hidden_layers']
    E = GEOM['num_experts']
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
        dst = f'model.language_model.layers.{l}.'
        if rest.startswith('linear_attn.in_proj'):
            continue  # handled via _split_linear_attn below
        if rest.startswith('mlp.') and dense_mlp is not None:
            continue
        if fused_experts and '.experts.' in rest:
            continue
        out[dst + rest] = w
    for l in range(L):
        if LAYER_TYPES[l] == 'linear_attention':
            for k, w in _split_linear_attn(sd, l).items():
                out[f'model.language_model.layers.{l}.linear_attn.{k}'] = w
        dst = f'model.language_model.layers.{l}.mlp.'
        if dense_mlp is not None:
            g, u, d = dense_mlp[l]
            out[dst + 'gate_proj.weight'] = g
            out[dst + 'up_proj.weight'] = u
            out[dst + 'down_proj.weight'] = d
        elif fused_experts:
            src = f'model.layers.{l}.mlp.experts.'
            gu = np.stack([np.concatenate(
                [sd[src + f'{e}.gate_proj.weight'],
                 sd[src + f'{e}.up_proj.weight']], axis=0)
                for e in range(E)])                        # [E, 2I, H]
            dn = np.stack([sd[src + f'{e}.down_proj.weight']
                           for e in range(E)])             # [E, H, I]
            out[dst + 'experts.gate_up_proj'] = gu
            out[dst + 'experts.down_proj'] = dn

    os.makedirs(out_dir, exist_ok=True)
    save_file(out, os.path.join(out_dir, 'model.safetensors'))
    text_cfg = dict(GEOM, layer_types=LAYER_TYPES,
                    rope_scaling={'rope_type': 'default',
                                  'mrope_section': [2, 1, 1],
                                  'mrope_interleaved': True})
    if dense_mlp is not None:
        for k in ('num_experts', 'num_experts_per_tok', 'moe_intermediate_size',
                  'shared_expert_intermediate_size'):
            text_cfg.pop(k)
    cfg = {
        'architectures': [arch],
        'model_type': model_type,
        'text_config': text_cfg,
        'torch_dtype': 'float32',
    }
    if with_vision:
        cfg['vision_config'] = dict(TINY_VISION)
        cfg['image_token_id'] = 120
    with open(os.path.join(out_dir, 'config.json'), 'w') as f:
        json.dump(cfg, f)
    make_tiny_tokenizer(out_dir, vocab_size=128)
    return out_dir


def _hf_greedy(model_dir, prompt, n):
    import torch
    from transformers import AutoModelForCausalLM
    model = AutoModelForCausalLM.from_pretrained(
        model_dir, torch_dtype=torch.float32).eval()
    ids = torch.tensor([prompt])
    with torch.no_grad():
        out = model.generate(ids, max_new_tokens=n, do_sample=False,
                             use_cache=True)
    return out[0, len(prompt):].tolist()


def _engine(model_dir, speculative_config=None, **over):
    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import TpuEngineConfig
    kw = dict(dtype='float32', block_size=16, num_gpu_blocks=48,
              max_batch_size=4, session_len=256, max_prefill_token_num=64)
    kw.update(over)
    return Engine.from_pretrained(model_dir, TpuEngineConfig(**kw),
                                  speculative_config=speculative_config)


def _gen(eng, sid, prompt, n):
    from lmdeploy_tpu.messages import GenerationConfig

    async def run():
        inst = eng.create_instance()
        out = await inst.async_infer(sid, prompt,
                                     GenerationConfig(max_new_tokens=n,
                                                      ignore_eos=True))
        await inst.async_end(sid)
        return list(out.token_ids)

    loop = asyncio.new_event_loop()
    try:
        return loop.run_until_complete(run())
    finally:
        loop.close()


def test_moe_matches_transformers_twin(next_src_dir, tmp_path):
    """qwen3_5_moe layout (split projections, fused expert stacks, nested
    prefixes, vision_config present) reproduces transformers' greedy tokens
    of the mathematically identical qwen3-next checkpoint."""
    sd = _load_sd(next_src_dir)
    q35 = _write_qwen3_5(sd, str(tmp_path / 'q35_moe'),
                         'Qwen3_5MoeForConditionalGeneration', 'qwen3_5_moe',
                         fused_experts=True, with_vision=True)
    prompt = [3, 17, 42, 99, 7, 23, 55, 12, 81, 30, 5]
    want = _hf_greedy(next_src_dir, prompt, 10)
    eng = _engine(q35)
    try:
        got = _gen(eng, 1, prompt, 10)
        assert eng.model_agent.cache_engine.kv_cache['pages'].shape[0] == 1
        assert eng.model_agent.cache_engine.kv_cache['rec'].shape[0] == 3
    finally:
        eng.close()
    assert got == want, (got, want)


def test_moe_per_expert_names_match_fused(next_src_dir, tmp_path):
    """fp8-style per-expert tensor names load identically to the fused
    stacks (reference _load_weight_experts non-fused branch)."""
    sd = _load_sd(next_src_dir)
    q35 = _write_qwen3_5(sd, str(tmp_path / 'q35_pe'),
                         'Qwen3_5MoeForConditionalGeneration', 'qwen3_5_moe',
                         fused_experts=False)
    prompt = [3, 17, 42, 99, 7, 23, 55, 12, 81, 30, 5]
    want = _hf_greedy(next_src_dir, prompt, 10)
    eng = _engine(q35)
    try:
        got = _gen(eng, 1, prompt, 10)
    finally:
        eng.close()
    assert got == want, (got, want)


def test_dense_matches_one_expert_moe(next_src_dir, tmp_path):
    """Qwen3_5ForConditionalGeneration (dense mlp) vs a 1-expert MoE twin
    whose single expert IS the dense mlp and whose shared expert is zeroed:
    softmax over one router logit = 1 and norm_topk keeps it 1, so outputs
    must be bit-comparable."""
    sd = _load_sd(next_src_dir)
    rng = np.random.RandomState(5)
    H, I = GEOM['hidden_size'], GEOM['intermediate_size']
    L = GEOM['num_hidden_layers']
    dense = {l: (rng.randn(I, H).astype(np.float32) * 0.08,
                 rng.randn(I, H).astype(np.float32) * 0.08,
                 rng.randn(H, I).astype(np.float32) * 0.08)
             for l in range(L)}
    q35_dense = _write_qwen3_5(sd, str(tmp_path / 'q35_dense'),
                               'Qwen3_5ForConditionalGeneration', 'qwen3_5',
                               dense_mlp=dense)

    # 1-expert MoE twin: overwrite the mlp tensors in the fused checkpoint
    from safetensors.numpy import save_file
    moe_dir = str(tmp_path / 'q35_onemoe')
    _write_qwen3_5(sd, moe_dir, 'Qwen3_5MoeForConditionalGeneration',
                   'qwen3_5_moe', fused_experts=True)
    from safetensors.numpy import load_file
    tensors = load_file(os.path.join(moe_dir, 'model.safetensors'))
    SI = GEOM['shared_expert_intermediate_size']
    for l in range(L):
        g, u, d = dense[l]
        p = f'model.language_model.layers.{l}.mlp.'
        tensors[p + 'experts.gate_up_proj'] = \
            np.concatenate([g, u], axis=0)[None]           # [1, 2I, H]
        tensors[p + 'experts.down_proj'] = d[None]         # [1, H, I]
        tensors[p + 'gate.weight'] = np.zeros((1, H), np.float32)
        tensors[p + 'shared_expert.gate_proj.weight'] = \
            np.zeros((SI, H), np.float32)
        tensors[p + 'shared_expert.up_proj.weight'] = \
            np.zeros((SI, H), np.float32)
        tensors[p + 'shared_expert.down_proj.weight'] = \
            np.zeros((H, SI), np.float32)
        tensors[p + 'shared_expert_gate.weight'] = np.zeros((1, H),
                                                            np.float32)
    save_file(tensors, os.path.join(moe_dir, 'model.safetensors'))
    cfg = json.load(open(os.path.join(moe_dir, 'config.json')))
    cfg['text_config'].update(num_experts=1, num_experts_per_tok=1,
                              moe_intermediate_size=I,
                              shared_expert_intermediate_size=SI)
    json.dump(cfg, open(os.path.join(moe_dir, 'config.json'), 'w'))

    prompt = [4, 19, 40, 90, 8, 25, 50, 13, 80, 31, 6]
    e1 = _engine(q35_dense)
    try:
        got_dense = _gen(e1, 1, prompt, 10)
    finally:
        e1.close()
    e2 = _engine(moe_dir)
    try:
        got_moe = _gen(e2, 1, prompt, 10)
    finally:
        e2.close()
    assert got_dense == got_moe, (got_dense, got_moe)


def _add_mtp_weights(model_dir, moe=True, seed=7):
    """Append random 'mtp.' proposer weights to a qwen3_5 checkpoint.

    Draft quality is irrelevant for correctness (greedy verification is
    exact-match; sampling uses rejection sampling), so random weights fully
    exercise the accept/reject + state-rollback machinery."""
    from safetensors.numpy import load_file, save_file
    rng = np.random.RandomState(seed)
    H = GEOM['hidden_size']
    D = GEOM['head_dim']
    NH, NKV = GEOM['num_attention_heads'], GEOM['num_key_value_heads']
    E, I = GEOM['num_experts'], GEOM['moe_intermediate_size']
    SI = GEOM['shared_expert_intermediate_size']

    def r(*shape, s=0.06):
        return (rng.randn(*shape) * s).astype(np.float32)

    t = load_file(os.path.join(model_dir, 'model.safetensors'))
    t['mtp.pre_fc_norm_embedding.weight'] = r(H, s=0.02)
    t['mtp.pre_fc_norm_hidden.weight'] = r(H, s=0.02)
    t['mtp.fc.weight'] = r(H, 2 * H)
    t['mtp.norm.weight'] = r(H, s=0.02)
    p = 'mtp.layers.0.'
    t[p + 'input_layernorm.weight'] = r(H, s=0.02)
    t[p + 'post_attention_layernorm.weight'] = r(H, s=0.02)
    t[p + 'self_attn.q_proj.weight'] = r(NH * 2 * D, H)
    t[p + 'self_attn.k_proj.weight'] = r(NKV * D, H)
    t[p + 'self_attn.v_proj.weight'] = r(NKV * D, H)
    t[p + 'self_attn.o_proj.weight'] = r(H, NH * D)
    t[p + 'self_attn.q_norm.weight'] = r(D, s=0.02)
    t[p + 'self_attn.k_norm.weight'] = r(D, s=0.02)
    if moe:
        t[p + 'mlp.gate.weight'] = r(E, H)
        t[p + 'mlp.experts.gate_up_proj'] = r(E, 2 * I, H)
        t[p + 'mlp.experts.down_proj'] = r(E, H, I)
        t[p + 'mlp.shared_expert.gate_proj.weight'] = r(SI, H)
        t[p + 'mlp.shared_expert.up_proj.weight'] = r(SI, H)
        t[p + 'mlp.shared_expert.down_proj.weight'] = r(H, SI)
        t[p + 'mlp.shared_expert_gate.weight'] = r(1, H)
    else:
        t[p + 'mlp.gate_proj.weight'] = r(GEOM['intermediate_size'], H)
        t[p + 'mlp.up_proj.weight'] = r(GEOM['intermediate_size'], H)
        t[p + 'mlp.down_proj.weight'] = r(H, GEOM['intermediate_size'])
    save_file(t, os.path.join(model_dir, 'model.safetensors'))


def test_mtp_spec_greedy_token_identical(next_src_dir, tmp_path):
    """method='qwen3_5_mtp' speculative decoding must be token-identical to
    plain greedy decoding — this exercises the hybrid target's per-position
    conv/recurrent state snapshots and post-rejection rollback (a rollback
    bug diverges the stream right after the first rejected draft)."""
    sd = _load_sd(next_src_dir)
    q35 = _write_qwen3_5(sd, str(tmp_path / 'q35_mtp'),
                         'Qwen3_5MoeForConditionalGeneration', 'qwen3_5_moe',
                         fused_experts=True)
    _add_mtp_weights(q35, moe=True)
    prompt = [3, 17, 42, 99, 7, 23, 55, 12, 81, 30, 5]

    eng = _engine(q35)
    try:
        want = _gen(eng, 1, prompt, 24)
    finally:
        eng.close()

    from lmdeploy_tpu.messages import SpeculativeConfig
    eng = _engine(q35, speculative_config=SpeculativeConfig(
        method='qwen3_5_mtp', num_speculative_tokens=3))
    try:
        got = _gen(eng, 2, prompt, 24)
    finally:
        eng.close()
    assert got == want, (got, want)


def test_vl_build_surface(next_src_dir, tmp_path):
    """VL wiring: nested config builds the mixin model with a deepstack-free
    tower, H-wide embed features, and interleaved-mrope plumbing."""
    sd = _load_sd(next_src_dir)
    q35 = _write_qwen3_5(sd, str(tmp_path / 'q35_vl'),
                         'Qwen3_5MoeForConditionalGeneration', 'qwen3_5_moe',
                         with_vision=True)
    from lmdeploy_tpu.config import ModelConfig
    from lmdeploy_tpu.models import build_model
    cfg = ModelConfig.from_pretrained(q35, dtype='float32')
    assert cfg.vision is not None
    model = build_model(cfg)
    assert model.uses_mrope
    assert model.tower.ds_idx == ()
    assert model.embed_feature_width == cfg.hidden_size
    assert model.image_token_index == 120
    # mrope positions for a prompt with one 2x2-merged image span
    ids = [3, 120, 120, 120, 120, 7, 9]
    pos, nxt = model.build_mrope(ids, [(1, 4, 4)])
    assert pos.shape == (len(ids), 3)
    assert nxt == 5  # 1 text + max(1,2,2) image + 2 text
