"""VLM (llava-family) tests on a tiny random checkpoint (CPU jax).

The e2e check mirrors test_engine_e2e.py's dense-reference strategy: the paged
engine fed an image must produce the same greedy continuation as a naive dense
transformer whose input embeddings are manually overwritten with the projected
vision features at the image-token positions.
"""
import json

import numpy as np
import pytest

from conftest import TINY_CFG, make_tiny_tokenizer

VISION_CFG = {
    'image_size': 28,
    'patch_size': 14,
    'hidden_size': 32,
    'num_attention_heads': 2,
    'intermediate_size': 64,
    'num_hidden_layers': 2,
    'layer_norm_eps': 1e-5,
    'hidden_act': 'quick_gelu',
}
IMAGE_TOKEN_ID = 3   # '<image>' special token in the tiny tokenizer


@pytest.fixture(scope='module')
def tiny_llava_dir(tmp_path_factory):
    from safetensors.numpy import save_file

    path = tmp_path_factory.mktemp('tiny_llava')
    cfg = {
        'architectures': ['LlavaForConditionalGeneration'],
        'model_type': 'llava',
        'text_config': dict(TINY_CFG),
        'vision_config': dict(VISION_CFG),
        'image_token_index': IMAGE_TOKEN_ID,
        'vision_feature_layer': -2,
        'vision_feature_select_strategy': 'default',
        'projector_hidden_act': 'gelu',
        'torch_dtype': 'float32',
    }
    with open(path / 'config.json', 'w') as f:
        json.dump(cfg, f)
    # tokenizer with '<image>' as special token id 3
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders, trainers
    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=256, special_tokens=['<s>', '</s>', '<pad>', '<image>'],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    tok.train_from_iterator(['hello world this is a tiny test corpus ' * 10],
                            trainer)
    tok.save(str(path / 'tokenizer.json'))
    with open(path / 'tokenizer_config.json', 'w') as f:
        json.dump({'tokenizer_class': 'PreTrainedTokenizerFast',
                   'bos_token': '<s>', 'eos_token': '</s>',
                   'model_max_length': 512,
                   'additional_special_tokens': ['<image>']}, f)

    rng = np.random.RandomState(7)
    t = TINY_CFG
    H, I, V = t['hidden_size'], t['intermediate_size'], t['vocab_size']
    nh, nkv, hd = (t['num_attention_heads'], t['num_key_value_heads'],
                   t['head_dim'])
    tensors = {
        'language_model.model.embed_tokens.weight': rng.randn(V, H) * 0.02,
        'language_model.model.norm.weight': np.ones(H),
        'language_model.lm_head.weight': rng.randn(V, H) * 0.02,
    }
    for layer in range(t['num_hidden_layers']):
        p = f'language_model.model.layers.{layer}.'
        tensors.update({
            p + 'input_layernorm.weight': np.ones(H),
            p + 'post_attention_layernorm.weight': np.ones(H),
            p + 'self_attn.q_proj.weight': rng.randn(nh * hd, H) * 0.02,
            p + 'self_attn.k_proj.weight': rng.randn(nkv * hd, H) * 0.02,
            p + 'self_attn.v_proj.weight': rng.randn(nkv * hd, H) * 0.02,
            p + 'self_attn.o_proj.weight': rng.randn(H, nh * hd) * 0.02,
            p + 'mlp.gate_proj.weight': rng.randn(I, H) * 0.02,
            p + 'mlp.up_proj.weight': rng.randn(I, H) * 0.02,
            p + 'mlp.down_proj.weight': rng.randn(H, I) * 0.02,
        })
    # vision tower + projector
    vc = VISION_CFG
    W, M, P = vc['hidden_size'], vc['intermediate_size'], vc['patch_size']
    nP = (vc['image_size'] // P) ** 2
    vt = 'vision_tower.vision_model.'
    tensors.update({
        vt + 'embeddings.patch_embedding.weight':
            rng.randn(W, 3, P, P) * 0.02,
        vt + 'embeddings.class_embedding': rng.randn(W) * 0.02,
        vt + 'embeddings.position_embedding.weight': rng.randn(nP + 1, W) * 0.02,
        vt + 'pre_layrnorm.weight': np.ones(W),
        vt + 'pre_layrnorm.bias': np.zeros(W),
        'multi_modal_projector.linear_1.weight': rng.randn(H, W) * 0.05,
        'multi_modal_projector.linear_1.bias': np.zeros(H),
        'multi_modal_projector.linear_2.weight': rng.randn(H, H) * 0.05,
        'multi_modal_projector.linear_2.bias': np.zeros(H),
    })
    # feature_layer=-2 with 2 layers => only encoder layer 0 runs, but ship both
    for layer in range(vc['num_hidden_layers']):
        p = f'{vt}encoder.layers.{layer}.'
        tensors.update({
            p + 'layer_norm1.weight': np.ones(W), p + 'layer_norm1.bias': np.zeros(W),
            p + 'layer_norm2.weight': np.ones(W), p + 'layer_norm2.bias': np.zeros(W),
            p + 'self_attn.q_proj.weight': rng.randn(W, W) * 0.05,
            p + 'self_attn.q_proj.bias': np.zeros(W),
            p + 'self_attn.k_proj.weight': rng.randn(W, W) * 0.05,
            p + 'self_attn.k_proj.bias': np.zeros(W),
            p + 'self_attn.v_proj.weight': rng.randn(W, W) * 0.05,
            p + 'self_attn.v_proj.bias': np.zeros(W),
            p + 'self_attn.out_proj.weight': rng.randn(W, W) * 0.05,
            p + 'self_attn.out_proj.bias': np.zeros(W),
            p + 'mlp.fc1.weight': rng.randn(M, W) * 0.05,
            p + 'mlp.fc1.bias': np.zeros(M),
            p + 'mlp.fc2.weight': rng.randn(W, M) * 0.05,
            p + 'mlp.fc2.bias': np.zeros(W),
        })
    tensors = {k: np.ascontiguousarray(v.astype(np.float32))
               for k, v in tensors.items()}
    save_file(tensors, str(path / 'model.safetensors'))
    return str(path)


def test_expand_image_tokens():
    from lmdeploy_tpu.vl.processor import expand_image_tokens

    ids, offs = expand_image_tokens([5, 9, 5, 9, 6], 9, 3, 2)
    assert ids == [5, 9, 9, 9, 5, 9, 9, 9, 6]
    assert offs == [1, 5]
    # no placeholder: blocks prepended
    ids, offs = expand_image_tokens([5, 6], 9, 3, 1)
    assert ids == [9, 9, 9, 5, 6]
    assert offs == [0]
    with pytest.raises(ValueError):
        expand_image_tokens([9, 5], 9, 3, 2)


def test_image_processor():
    from lmdeploy_tpu.vl.processor import ImageProcessor

    proc = ImageProcessor(image_size=28)
    img = np.random.RandomState(0).randint(0, 255, (40, 60, 3), np.uint8)
    out = proc([img, img])
    assert out.shape == (2, 28, 28, 3)
    assert np.isfinite(out).all()
    # deterministic
    np.testing.assert_array_equal(out[0], proc([img])[0])


def test_tower_and_projector_shapes(tiny_llava_dir):
    import jax
    from lmdeploy_tpu.config import ModelConfig
    from lmdeploy_tpu.models import build_model
    from lmdeploy_tpu.weight_loader import load_vis_params_np

    cfg = ModelConfig.from_pretrained(tiny_llava_dir, dtype='float32')
    assert cfg.vision is not None and cfg.hidden_size == TINY_CFG['hidden_size']
    model = build_model(cfg)
    assert model.num_image_tokens == 4          # (28/14)^2 patches, CLS dropped
    vis = jax.tree_util.tree_map(np.asarray, load_vis_params_np(
        model, tiny_llava_dir))
    pix = np.random.RandomState(1).randn(1, 28, 28, 3).astype(np.float32)
    feats = model.encode_images(vis, pix)
    assert feats.shape == (1, 4, TINY_CFG['hidden_size'])
    assert np.isfinite(np.asarray(feats)).all()


def _dense_greedy_with_embeds(params, cfg, prompt_ids, embeds, offset, num_new):
    """Dense reference with image features overwriting embeds at [offset, ...)."""
    from lmdeploy_tpu.nn.layers import make_rope_table

    p = {k: np.asarray(v) if not isinstance(v, dict)
         else {k2: np.asarray(v2) for k2, v2 in v.items()}
         for k, v in params.items()}
    H, D = cfg.hidden_size, cfg.head_dim
    Hq, Hkv = cfg.num_attention_heads, cfg.num_key_value_heads
    G = Hq // Hkv
    cos_t, sin_t = map(np.asarray, make_rope_table(D, 512, cfg.rope_theta))

    def rmsnorm(x, w):
        return x / np.sqrt((x * x).mean(-1, keepdims=True) + cfg.rms_norm_eps) * w

    def rope(x, pos):
        c, s = cos_t[pos][:, None, :], sin_t[pos][:, None, :]
        d2 = D // 2
        x1, x2 = x[..., :d2], x[..., d2:]
        return np.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], -1)

    ids = list(prompt_ids)
    for _ in range(num_new):
        S = len(ids)
        pos = np.arange(S)
        h = p['embed'][np.asarray(ids)].copy()
        h[offset:offset + len(embeds)] = embeds
        for layer in range(cfg.num_layers):
            lw = {k: v[layer] for k, v in p['layers'].items()}
            x = rmsnorm(h, lw['attn_norm'])
            q = rope((x @ lw['wq']).reshape(S, Hq, D), pos)
            k = rope((x @ lw['wk']).reshape(S, Hkv, D), pos)
            v = (x @ lw['wv']).reshape(S, Hkv, D)
            kr, vr = np.repeat(k, G, 1), np.repeat(v, G, 1)
            scores = np.einsum('shd,thd->hst', q, kr) / np.sqrt(D)
            scores = np.where(np.tril(np.ones((S, S), bool))[None], scores, -1e30)
            probs = np.exp(scores - scores.max(-1, keepdims=True))
            probs /= probs.sum(-1, keepdims=True)
            attn = np.einsum('hst,thd->shd', probs, vr).reshape(S, Hq * D)
            h = h + attn @ lw['wo']
            x = rmsnorm(h, lw['mlp_norm'])
            act = (x @ lw['w_gate'])
            act = act / (1 + np.exp(-act)) * (x @ lw['w_up'])
            h = h + act @ lw['w_down']
        h = rmsnorm(h, p['final_norm'])
        ids.append(int(np.argmax(h[-1] @ p['lm_head'])))
    return ids[len(prompt_ids):]


@pytest.fixture(scope='module')
def vl_engine(tiny_llava_dir):
    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import TpuEngineConfig
    cfg = TpuEngineConfig(dtype='float32', block_size=16, num_gpu_blocks=64,
                          max_batch_size=8, session_len=256,
                          max_prefill_token_num=64)
    eng = Engine.from_pretrained(tiny_llava_dir, cfg)
    yield eng
    eng.close()


def run_async(coro):
    import asyncio
    loop = asyncio.new_event_loop()
    try:
        return loop.run_until_complete(coro)
    finally:
        loop.close()


def test_vl_engine_matches_dense_reference(vl_engine):
    from lmdeploy_tpu.messages import GenerationConfig

    img = np.random.RandomState(3).randint(0, 255, (32, 48, 3), np.uint8)
    prompt = [5, IMAGE_TOKEN_ID, 17, 23, 29]

    async def run():
        inst = vl_engine.create_instance()
        gen = GenerationConfig(max_new_tokens=6, ignore_eos=True)
        out = await inst.async_infer(1, prompt, gen, mm_data=[img])
        await inst.async_end(1)
        return list(out.token_ids)

    got = run_async(run())

    agent = vl_engine.model_agent
    embeds = agent.encode_images([img])[0]                     # [4, H]
    n = agent.model.num_image_tokens
    expanded = [5] + [IMAGE_TOKEN_ID] * n + [17, 23, 29]
    expect = _dense_greedy_with_embeds(agent.host_params(), vl_engine.model_config,
                                       expanded, embeds, 1, 6)
    assert got == expect


def test_vl_text_only_still_works(vl_engine):
    """A VLM engine must serve plain text requests through the same step fns."""
    from lmdeploy_tpu.messages import GenerationConfig

    async def run():
        inst = vl_engine.create_instance()
        gen = GenerationConfig(max_new_tokens=4, ignore_eos=True)
        out = await inst.async_infer(2, [5, 17, 23], gen)
        await inst.async_end(2)
        return list(out.token_ids)

    assert len(run_async(run())) == 4


def test_vl_async_engine_openai_parts(tiny_llava_dir):
    """OpenAI message with image_url parts through AsyncEngine.generate."""
    import base64
    import io

    from PIL import Image

    from lmdeploy_tpu.messages import GenerationConfig, TpuEngineConfig
    from lmdeploy_tpu.serve.async_engine import AsyncEngine

    cfg = TpuEngineConfig(dtype='float32', block_size=16, num_gpu_blocks=64,
                          max_batch_size=4, session_len=256,
                          max_prefill_token_num=64)
    eng = AsyncEngine(tiny_llava_dir, backend_config=cfg)
    img = Image.fromarray(np.random.RandomState(5).randint(
        0, 255, (32, 32, 3), np.uint8))
    buf = io.BytesIO()
    img.save(buf, format='PNG')
    uri = 'data:image/png;base64,' + base64.b64encode(buf.getvalue()).decode()
    messages = [{'role': 'user', 'content': [
        {'type': 'text', 'text': 'describe'},
        {'type': 'image_url', 'image_url': {'url': uri}},
    ]}]

    async def run():
        text = ''
        n = 0
        async for out in eng.generate(messages, 11, gen_config=GenerationConfig(
                max_new_tokens=5, ignore_eos=True)):
            text += out.response
            n = out.generate_token_len
        return text, n

    try:
        text, n = run_async(run())
        assert n == 5
    finally:
        eng.close()


# -- InternVL (InternViT + pixel shuffle + internlm2 LM) -----------------------------

IVL_VISION = {
    'image_size': 28, 'patch_size': 14, 'hidden_size': 32,
    'num_attention_heads': 2, 'intermediate_size': 64, 'num_hidden_layers': 2,
    'layer_norm_eps': 1e-6, 'qk_normalization': True, 'norm_type': 'layer_norm',
    'hidden_act': 'gelu',
}


@pytest.fixture(scope='module')
def tiny_internvl_dir(tmp_path_factory):
    from safetensors.numpy import save_file

    path = tmp_path_factory.mktemp('tiny_internvl')
    llm_cfg = dict(TINY_CFG)
    llm_cfg['architectures'] = ['InternLM2ForCausalLM']
    cfg = {
        'architectures': ['InternVLChatModel'],
        'model_type': 'internvl_chat',
        'llm_config': llm_cfg,
        'vision_config': dict(IVL_VISION),
        'downsample_ratio': 0.5,
        'torch_dtype': 'float32',
    }
    with open(path / 'config.json', 'w') as f:
        json.dump(cfg, f)
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders, trainers
    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=256, special_tokens=['<s>', '</s>', '<pad>', '<IMG_CONTEXT>'],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    tok.train_from_iterator(['hello world this is a tiny test corpus ' * 10],
                            trainer)
    tok.save(str(path / 'tokenizer.json'))
    with open(path / 'tokenizer_config.json', 'w') as f:
        json.dump({'tokenizer_class': 'PreTrainedTokenizerFast',
                   'bos_token': '<s>', 'eos_token': '</s>',
                   'model_max_length': 512,
                   'additional_special_tokens': ['<IMG_CONTEXT>']}, f)

    rng = np.random.RandomState(13)
    t = TINY_CFG
    H, I, V = t['hidden_size'], t['intermediate_size'], t['vocab_size']
    nh, nkv, hd = (t['num_attention_heads'], t['num_key_value_heads'],
                   t['head_dim'])
    G = nh // nkv
    tensors = {
        'language_model.model.tok_embeddings.weight': rng.randn(V, H) * 0.02,
        'language_model.model.norm.weight': np.ones(H),
        'language_model.output.weight': rng.randn(V, H) * 0.02,
    }
    for layer in range(t['num_hidden_layers']):
        p = f'language_model.model.layers.{layer}.'
        tensors[p + 'attention_norm.weight'] = np.ones(H)
        tensors[p + 'ffn_norm.weight'] = np.ones(H)
        tensors[p + 'attention.wqkv.weight'] = \
            rng.randn(nkv * (G + 2) * hd, H) * 0.02
        tensors[p + 'attention.wo.weight'] = rng.randn(H, nh * hd) * 0.02
        tensors[p + 'feed_forward.w1.weight'] = rng.randn(I, H) * 0.02
        tensors[p + 'feed_forward.w3.weight'] = rng.randn(I, H) * 0.02
        tensors[p + 'feed_forward.w2.weight'] = rng.randn(H, I) * 0.02
    # InternViT
    vc = IVL_VISION
    W, M, P = vc['hidden_size'], vc['intermediate_size'], vc['patch_size']
    nP = (vc['image_size'] // P) ** 2
    tensors.update({
        'vision_model.embeddings.patch_embedding.weight':
            rng.randn(W, 3, P, P) * 0.02,
        'vision_model.embeddings.patch_embedding.bias': np.zeros(W),
        'vision_model.embeddings.class_embedding': rng.randn(1, 1, W) * 0.02,
        'vision_model.embeddings.position_embedding':
            rng.randn(1, nP + 1, W) * 0.02,
    })
    for layer in range(vc['num_hidden_layers']):
        p = f'vision_model.encoder.layers.{layer}.'
        tensors.update({
            p + 'norm1.weight': np.ones(W), p + 'norm1.bias': np.zeros(W),
            p + 'norm2.weight': np.ones(W), p + 'norm2.bias': np.zeros(W),
            p + 'attn.qkv.weight': rng.randn(3 * W, W) * 0.05,
            p + 'attn.qkv.bias': np.zeros(3 * W),
            p + 'attn.proj.weight': rng.randn(W, W) * 0.05,
            p + 'attn.proj.bias': np.zeros(W),
            p + 'attn.q_norm.weight': np.ones(W),
            p + 'attn.k_norm.weight': np.ones(W),
            p + 'ls1': np.full(W, 0.5), p + 'ls2': np.full(W, 0.5),
            p + 'mlp.fc1.weight': rng.randn(M, W) * 0.05,
            p + 'mlp.fc1.bias': np.zeros(M),
            p + 'mlp.fc2.weight': rng.randn(W, M) * 0.05,
            p + 'mlp.fc2.bias': np.zeros(W),
        })
    # mlp1 projector: LN(C) -> Linear(C->H) -> GELU -> Linear(H->H); C = W*4
    C = W * 4
    tensors.update({
        'mlp1.0.weight': np.ones(C), 'mlp1.0.bias': np.zeros(C),
        'mlp1.1.weight': rng.randn(H, C) * 0.05, 'mlp1.1.bias': np.zeros(H),
        'mlp1.3.weight': rng.randn(H, H) * 0.05, 'mlp1.3.bias': np.zeros(H),
    })
    tensors = {k: np.ascontiguousarray(np.asarray(v, np.float32))
               for k, v in tensors.items()}
    save_file(tensors, str(path / 'model.safetensors'))
    return str(path)


def test_internvl_geometry(tiny_internvl_dir):
    from lmdeploy_tpu.config import ModelConfig
    from lmdeploy_tpu.models import build_model

    cfg = ModelConfig.from_pretrained(tiny_internvl_dir, dtype='float32')
    model = build_model(cfg)
    # 2x2 patch grid, pixel-shuffled by 0.5 -> 1 token per image
    assert model.num_image_tokens == 1
    assert model.image_marker == '<IMG_CONTEXT>'
    assert model.image_token_index is None      # resolved via tokenizer later
    from lmdeploy_tpu.models.internlm2 import InternLM2Model
    assert isinstance(model, InternLM2Model)


def test_internvl_engine_matches_dense_reference(tiny_internvl_dir):
    """Paged engine fed an image == dense internlm2 reference with the
    projected InternViT feature stuffed at the placeholder position."""
    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import GenerationConfig, TpuEngineConfig
    from lmdeploy_tpu.tokenizer import Tokenizer

    cfg = TpuEngineConfig(dtype='float32', block_size=16, num_gpu_blocks=64,
                          max_batch_size=4, session_len=256,
                          max_prefill_token_num=64)
    tok = Tokenizer(tiny_internvl_dir)
    eng = Engine.from_pretrained(tiny_internvl_dir, cfg, tokenizer=tok)
    try:
        img = np.random.RandomState(9).randint(0, 255, (30, 40, 3), np.uint8)
        img_tok = tok.encode('<IMG_CONTEXT>', add_bos=False,
                             add_special_tokens=False)[-1]
        prompt = [5, img_tok, 17, 23]

        async def run():
            inst = eng.create_instance()
            out = await inst.async_infer(
                1, prompt, GenerationConfig(max_new_tokens=6, ignore_eos=True),
                mm_data=[img])
            await inst.async_end(1)
            return list(out.token_ids)

        got = run_async(run())
        agent = eng.model_agent
        embeds = agent.encode_images([img])[0]               # [1, H]
        expanded = [5, img_tok, 17, 23]                      # 1 token per image
        expect = _dense_greedy_with_embeds(agent.host_params(), eng.model_config,
                                           expanded, embeds, 1, 6)
        assert got == expect
    finally:
        eng.close()


def test_vlm_prefix_caching_content_exact(tiny_llava_dir):
    """Multimodal prefix caching (VERDICT r3 missing #7): VLM prompts no
    longer skip the trie — block identity is salted with per-span content
    digests, so (a) the same image reuses its cached prefix and (b) a
    DIFFERENT image with identical token ids never aliases it."""
    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import GenerationConfig, TpuEngineConfig

    def mk(prefix_caching=True):
        cfg = TpuEngineConfig(dtype='float32', block_size=16,
                              num_gpu_blocks=64, max_batch_size=4,
                              session_len=256, max_prefill_token_num=128,
                              enable_prefix_caching=prefix_caching)
        return Engine.from_pretrained(tiny_llava_dir, cfg)

    def gen(eng, sid, prompt, img):
        async def run():
            inst = eng.create_instance()
            out = await inst.async_infer(
                sid, prompt, GenerationConfig(max_new_tokens=5,
                                              ignore_eos=True),
                mm_data=[img])
            await inst.async_end(sid)
            return list(out.token_ids)
        return run_async(run())

    rng = np.random.RandomState(7)
    img_a = rng.randint(0, 255, (32, 48, 3), np.uint8)
    img_b = (rng.randint(0, 255, (32, 48, 3), np.uint8) * 0 + 250)
    filler = rng.randint(5, 250, size=28).tolist()
    # image near the tail so generation is image-steered; expanded length 34
    # = 2 full 16-token blocks (the second overlapping the image span) + 2
    prompt = filler + [5, IMAGE_TOKEN_ID, 17]

    ref = mk(prefix_caching=False)
    try:
        want_a = gen(ref, 1, prompt, img_a)
        want_b = gen(ref, 2, prompt, img_b)
    finally:
        ref.close()
    assert want_a != want_b     # contents actually steer the output

    eng = mk(prefix_caching=True)
    try:
        assert gen(eng, 1, prompt, img_a) == want_a
        assert eng.scheduler.block_trie.num_cached_blocks >= 2
        # same image again: served THROUGH the cached prefix, same tokens
        assert gen(eng, 2, prompt, img_a) == want_a
        # different image, identical token ids: must NOT alias the cache
        assert gen(eng, 3, prompt, img_b) == want_b
    finally:
        eng.close()
