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
