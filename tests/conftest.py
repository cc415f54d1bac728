"""Test config: force CPU backend with 8 virtual devices (multi-chip sharding tests
run on a virtual mesh, per SURVEY.md §4 implication)."""
import os

os.environ['JAX_PLATFORMS'] = 'cpu'   # never run unit tests on the (tunneled) TPU
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '') +
                           ' --xla_force_host_platform_device_count=8')

# The axon sitecustomize force-selects the TPU platform after import, overriding the
# env var — override it back explicitly (tests must run on the 8-device virtual CPU).
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_default_matmul_precision', 'highest')

import json
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TINY_CFG = {
    'architectures': ['LlamaForCausalLM'],
    'model_type': 'llama',
    'hidden_size': 64,
    'intermediate_size': 128,
    'num_hidden_layers': 2,
    'num_attention_heads': 4,
    'num_key_value_heads': 2,
    'head_dim': 16,
    'vocab_size': 256,
    'max_position_embeddings': 512,
    'rms_norm_eps': 1e-6,
    'rope_theta': 10000.0,
    'bos_token_id': 1,
    'eos_token_id': 2,
    'tie_word_embeddings': False,
    'torch_dtype': 'float32',
}


def make_tiny_tokenizer(path: str, vocab_size: int = 256):
    """Byte-level BPE tokenizer with a tiny vocab, saved in HF format."""
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders, trainers
    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=vocab_size, special_tokens=['<s>', '</s>', '<pad>'],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    tok.train_from_iterator(['hello world this is a tiny test corpus ' * 10], trainer)
    tok.save(os.path.join(path, 'tokenizer.json'))
    with open(os.path.join(path, 'tokenizer_config.json'), 'w') as f:
        json.dump({'tokenizer_class': 'PreTrainedTokenizerFast',
                   'bos_token': '<s>', 'eos_token': '</s>',
                   'model_max_length': 512}, f)


@pytest.fixture(scope='session')
def tiny_model_dir(tmp_path_factory):
    """Tiny llama checkpoint: config + random safetensors + tokenizer."""
    import ml_dtypes
    from safetensors.numpy import save_file

    path = tmp_path_factory.mktemp('tiny_llama')
    cfg = dict(TINY_CFG)
    with open(path / 'config.json', 'w') as f:
        json.dump(cfg, f)
    make_tiny_tokenizer(str(path))

    rng = np.random.RandomState(0)
    H, I, V = cfg['hidden_size'], cfg['intermediate_size'], cfg['vocab_size']
    nh, nkv, hd = cfg['num_attention_heads'], cfg['num_key_value_heads'], cfg['head_dim']
    tensors = {
        'model.embed_tokens.weight': rng.randn(V, H) * 0.02,
        'model.norm.weight': np.ones(H),
        'lm_head.weight': rng.randn(V, H) * 0.02,
    }
    for layer in range(cfg['num_hidden_layers']):
        p = f'model.layers.{layer}.'
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
    tensors = {k: np.ascontiguousarray(v.astype(np.float32)) for k, v in tensors.items()}
    save_file(tensors, str(path / 'model.safetensors'))
    return str(path)


@pytest.fixture()
def tiny_engine_config():
    from lmdeploy_tpu.messages import TpuEngineConfig
    return TpuEngineConfig(dtype='float32', block_size=16, num_gpu_blocks=64,
                           max_batch_size=8, session_len=256,
                           max_prefill_token_num=128)
