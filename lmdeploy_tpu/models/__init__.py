"""Model registry: HF architecture name -> model class.

Reference analog: ``lmdeploy/pytorch/models/module_map.py`` + ``patch.py``
(build_patched_model).  Each entry builds a functional model from a ModelConfig.
"""
from __future__ import annotations

from typing import Callable, Dict

from ..config import ModelConfig
from .llama import LlamaModel

_REGISTRY: Dict[str, Callable[[ModelConfig], object]] = {}


def register_model(*hf_archs):
    def wrap(builder):
        for arch in hf_archs:
            _REGISTRY[arch] = builder
        return builder
    return wrap


def _llama(config: ModelConfig) -> LlamaModel:
    return LlamaModel(config)


def _qwen2(config: ModelConfig) -> LlamaModel:
    config.attention_bias = True
    return LlamaModel(config)


def _qwen3(config: ModelConfig) -> LlamaModel:
    config.qk_norm = True
    return LlamaModel(config)


def _mixtral(config: ModelConfig):
    from .mixtral import MixtralModel
    return MixtralModel(config)


def _qwen2_moe(config: ModelConfig):
    from .mixtral import MixtralModel
    config.attention_bias = True
    return MixtralModel(config)


register_model('LlamaForCausalLM')(_llama)
register_model('MistralForCausalLM')(_llama)
register_model('Qwen2ForCausalLM')(_qwen2)
register_model('Qwen3ForCausalLM')(_qwen3)
# SDAR diffusion LMs (block-denoising): qwen3/qwen3-moe arch + block-causal
# attention; the engine sets model.block_causal_size from dllm_block_length
# (reference: lmdeploy/pytorch/models/sdar.py, strategies/dllm/)
register_model('SDARForCausalLM')(_qwen3)
def _internlm2(config: ModelConfig):
    from .internlm2 import InternLM2Model
    return InternLM2Model(config)


def _gemma(config: ModelConfig):
    from .gemma import GemmaModel
    config.tie_word_embeddings = True
    return GemmaModel(config)


register_model('MixtralForCausalLM')(_mixtral)
register_model('Qwen2MoeForCausalLM')(_qwen2_moe)
register_model('InternLM2ForCausalLM')(_internlm2)
register_model('InternLM3ForCausalLM')(_internlm2)
register_model('GemmaForCausalLM')(_gemma)
register_model('Gemma2ForCausalLM')(_gemma)
register_model('Gemma3ForCausalLM', 'Gemma3TextForCausalLM')(_gemma)


def _llava(config: ModelConfig):
    from .llava import LlavaModel
    return LlavaModel(config)


def _deepseek(config: ModelConfig):
    from .deepseek import DeepseekV2Model
    # MLA: one latent kv head; cache payload dim comes from cache_head_dim
    config.num_key_value_heads = 1
    return DeepseekV2Model(config)


register_model('DeepseekV2ForCausalLM')(_deepseek)
register_model('DeepseekV3ForCausalLM')(_deepseek)


register_model('LlavaForConditionalGeneration')(_llava)
register_model('LlavaNextForConditionalGeneration')(_llava)


def _internvl(config: ModelConfig):
    from .internvl import build_internvl
    return build_internvl(config)


register_model('InternVLChatModel')(_internvl)


def _phi3(config: ModelConfig):
    from .phi3 import Phi3Model
    return Phi3Model(config)


def _glm4(config: ModelConfig):
    from .glm4 import Glm4Model
    m = Glm4Model(config)
    if config.hf_arch == 'GlmForCausalLM':   # glm-4-9b-hf: no sandwich norms
        m.sandwich_norms = False
    return m


def _qwen3_moe(config: ModelConfig):
    from .mixtral import MixtralModel
    config.qk_norm = True
    return MixtralModel(config)


register_model('Phi3ForCausalLM', 'Phi3SmallForCausalLM',
               'Phi4MMForCausalLM')(_phi3)


def _phi3_v(config: ModelConfig):
    from .phi3_v import build_phi3_v
    return build_phi3_v(config)


register_model('Phi3VForCausalLM')(_phi3_v)


def _minicpmv26(config: ModelConfig):
    from .minicpmv26 import build_minicpmv26
    return build_minicpmv26(config)


register_model('MiniCPMV')(_minicpmv26)


def _deepseek_vl2(config: ModelConfig):
    from .deepseek_vl2 import build_deepseek_vl2
    return build_deepseek_vl2(config)


register_model('DeepseekVLV2ForCausalLM')(_deepseek_vl2)


def _cogvlm(config: ModelConfig):
    from .cogvlm import build_cogvlm
    return build_cogvlm(config)


register_model('CogVLMForCausalLM')(_cogvlm)


def _qwen3_omni(config: ModelConfig):
    from .qwen3_omni import build_qwen3_omni
    return build_qwen3_omni(config)


register_model('Qwen3OmniMoeForConditionalGeneration',
               'Qwen3OmniMoeThinkerForConditionalGeneration')(_qwen3_omni)
register_model('Glm4ForCausalLM', 'GlmForCausalLM')(_glm4)
register_model('Qwen3MoeForCausalLM')(_qwen3_moe)
register_model('SDARMoeForCausalLM')(_qwen3_moe)


def _baichuan(config: ModelConfig):
    from .baichuan import BaichuanModel
    if config.num_attention_heads == 40 and config.hidden_size == 5120:
        raise ValueError('Baichuan-13B uses ALiBi positional bias, '
                         'which is not supported yet')
    return BaichuanModel(config)


def _internlm_v1(config: ModelConfig):
    from .baichuan import InternLMv1Model
    return InternLMv1Model(config)


def _deepseek_v1(config: ModelConfig):
    # DeepSeek-MoE 16B: standard GQA attention + softmax-routed MoE with
    # shared experts and dense first-k — the Glm4Moe geometry with softmax
    # scoring and full rotary
    from .glm4_moe import Glm4MoeModel
    assert (config.hf_config or {}).get('moe_layer_freq', 1) == 1, \
        'sparse moe_layer_freq != 1 is not supported'
    return Glm4MoeModel(config)


register_model('DeepseekForCausalLM')(_deepseek_v1)
register_model('BaiChuanForCausalLM', 'BaichuanForCausalLM')(_baichuan)
register_model('InternLMForCausalLM')(_internlm_v1)


def _glm4_moe(config: ModelConfig):
    from .glm4_moe import Glm4MoeModel
    config.scoring_func = 'sigmoid'        # Glm4MoeTopkRouter is sigmoid
    return Glm4MoeModel(config)


register_model('Glm4MoeForCausalLM')(_glm4_moe)


def _phimoe(config: ModelConfig):
    from .phimoe import PhiMoeModel
    return PhiMoeModel(config)


register_model('PhiMoEForCausalLM', 'PhimoeForCausalLM')(_phimoe)


def _starcoder2(config: ModelConfig):
    from .starcoder2 import Starcoder2Model
    return Starcoder2Model(config)


register_model('Starcoder2ForCausalLM')(_starcoder2)


def _qwen2_reward(config: ModelConfig):
    from .reward import Qwen2RewardModel
    return Qwen2RewardModel(config)


def _internlm2_reward(config: ModelConfig):
    from .reward import InternLM2RewardModel
    return InternLM2RewardModel(config)


register_model('Qwen2ForRewardModel')(_qwen2_reward)
register_model('InternLM2ForRewardModel')(_internlm2_reward)


def _qwen3_next(config: ModelConfig):
    from .qwen3_next import Qwen3NextModel
    hf = config.hf_config or {}
    lt = hf.get('layer_types')
    if lt:
        interval = lt.index('full_attention') + 1
    else:
        interval = hf.get('full_attention_interval', 4)
    # only the full-attention layers hold paged KV
    config.num_cache_layers = config.num_layers // interval
    return Qwen3NextModel(config)


register_model('Qwen3NextForCausalLM')(_qwen3_next)


def _qwen3_5(config: ModelConfig):
    from .qwen3_5 import build_qwen3_5
    hf = config.hf_config or {}
    lt = hf.get('layer_types')
    if lt:
        interval = lt.index('full_attention') + 1
    else:
        interval = hf.get('full_attention_interval', 4)
    config.num_cache_layers = config.num_layers // interval
    return build_qwen3_5(config)


register_model('Qwen3_5ForConditionalGeneration',
               'Qwen3_5MoeForConditionalGeneration',
               'InternS2PreviewForConditionalGeneration',
               'InternS2PreviewForCausalLM',
               # reference meta_moe.py / interns2_mobius.py are arch-name
               # re-registrations of the qwen3_5_moe compute graph
               # (reference module_map.py:203-208)
               'MetaMoeForConditionalGeneration',
               'InternS2MobiusForConditionalGeneration',
               'InternS2MobiusForCausalLM')(_qwen3_5)


def _qwen2_vl(config: ModelConfig):
    from .qwen2_vl import build_qwen2_vl
    return build_qwen2_vl(config)


register_model('Qwen2VLForConditionalGeneration',
               'Qwen2_5_VLForConditionalGeneration')(_qwen2_vl)


def _gpt_oss(config: ModelConfig):
    from .gpt_oss import GptOssModel
    config.attention_bias = True
    return GptOssModel(config)


register_model('GptOssForCausalLM')(_gpt_oss)


def _llama4(config: ModelConfig):
    from .llama4 import Llama4Model
    return Llama4Model(config)


# ForConditionalGeneration runs the text model (the LM tree carries a
# 'language_model.' prefix handled by the assign plan); vision tower TBD
register_model('Llama4ForCausalLM',
               'Llama4ForConditionalGeneration')(_llama4)


def _minicpm(config: ModelConfig):
    from .minicpm import MiniCPMModel
    return MiniCPMModel(config)


def _minicpm3(config: ModelConfig):
    from .minicpm import MiniCPM3Model
    return MiniCPM3Model(config)


register_model('MiniCPMForCausalLM')(_minicpm)
register_model('MiniCPM3ForCausalLM')(_minicpm3)


def _chatglm(config: ModelConfig):
    from .chatglm import ChatGLMModel
    return ChatGLMModel(config)


register_model('ChatGLMModel', 'ChatGLMForConditionalGeneration')(_chatglm)


def _qwen3_vl(config: ModelConfig):
    from .qwen3_vl import build_qwen3_vl
    return build_qwen3_vl(config)


def _qwen3_vl_moe(config: ModelConfig):
    from .qwen3_vl import build_qwen3_vl_moe
    return build_qwen3_vl_moe(config)


register_model('Qwen3VLForConditionalGeneration')(_qwen3_vl)
register_model('Qwen3VLMoeForConditionalGeneration')(_qwen3_vl_moe)


def _interns1_pro(config: ModelConfig):
    from .interns1_pro import build_interns1_pro
    return build_interns1_pro(config)


register_model('InternS1ProForConditionalGeneration',
               'InternS1_1_ForConditionalGeneration')(_interns1_pro)


def _gemma3_vl(config: ModelConfig):
    from .gemma3_vl import Gemma3VLModel
    return Gemma3VLModel(config)


register_model('Gemma3ForConditionalGeneration')(_gemma3_vl)


def _deepseek_v32(config: ModelConfig):
    from .deepseek_v32 import DeepseekV32Model
    return DeepseekV32Model(config)


register_model('DeepseekV32ForCausalLM')(_deepseek_v32)


def _deepseek_v4(config: ModelConfig):
    from .deepseek_v4 import DeepseekV4Model
    # MQA: one shared per-token kv vector of head_dim in the paged cache
    config.num_key_value_heads = 1
    return DeepseekV4Model(config)


register_model('DeepseekV4ForCausalLM')(_deepseek_v4)


def _glm_moe_dsa(config: ModelConfig):
    # GLM-5.2 configs may carry qk_head_dim != nope + rope; the rope share is
    # the remainder (reference configurations/glm_moe_dsa.py:51-53)
    hf = config.hf_config or {}
    qk_head_dim = hf.get('qk_head_dim')
    if qk_head_dim and qk_head_dim != (config.qk_nope_head_dim
                                       + config.qk_rope_head_dim):
        config.qk_rope_head_dim = qk_head_dim - config.qk_nope_head_dim
    from .glm_moe_dsa import GlmMoeDsaModel
    return GlmMoeDsaModel(config)


register_model('GlmMoeDsaForCausalLM')(_glm_moe_dsa)


def _glm4_1v(config: ModelConfig):
    from .glm4_1v import build_glm4_1v
    return build_glm4_1v(config)


register_model('Glm4vForConditionalGeneration')(_glm4_1v)


def _internvl_hf(config: ModelConfig):
    from .internvl import build_internvl_hf
    return build_internvl_hf(config)


register_model('InternVLForConditionalGeneration',
               'InternS1ForConditionalGeneration')(_internvl_hf)


def build_model(config: ModelConfig):
    builder = _REGISTRY.get(config.hf_arch)
    if builder is None:
        raise ValueError(
            f'unsupported architecture {config.hf_arch!r}; '
            f'supported: {sorted(_REGISTRY)}')
    return builder(config)


def supported_archs():
    return sorted(_REGISTRY)
