"""Internal engine configuration derived from user configs + HF model configs.

TPU-native analog of the reference's ``lmdeploy/pytorch/config.py`` (ModelConfig ``:383``,
CacheConfig ``:108``, DistConfig ``:158``, SchedulerConfig).  The DistConfig here describes a
jax Mesh (axis names + sizes) rather than torch process groups.
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

from .messages import QuantPolicy, TpuEngineConfig


def _str_dtype(dtype: str):
    import jax.numpy as jnp
    return {
        'float16': jnp.float16,
        'bfloat16': jnp.bfloat16,
        'float32': jnp.float32,
    }[dtype]


@dataclass
class ModelConfig:
    """Normalized transformer geometry parsed from a HF config.json.

    Reference analog: ``lmdeploy/pytorch/config.py:383`` (ModelConfig.from_pretrained).
    """

    num_layers: int
    num_attention_heads: int
    num_key_value_heads: int
    hidden_size: int
    intermediate_size: int
    vocab_size: int
    head_dim: int
    max_position_embeddings: int = 4096
    rope_theta: float = 10000.0
    rope_scaling: Optional[Dict[str, Any]] = None
    rms_norm_eps: float = 1e-6
    tie_word_embeddings: bool = False
    bos_token_id: Optional[int] = 1
    eos_token_id: List[int] = field(default_factory=lambda: [2])
    dtype: str = 'bfloat16'
    hf_arch: str = 'LlamaForCausalLM'
    model_type: str = 'llama'
    # MoE geometry (0 experts => dense)
    num_experts: int = 0
    num_experts_per_tok: int = 0
    moe_intermediate_size: int = 0
    num_shared_experts: int = 0
    norm_topk_prob: bool = True
    # attention extras
    attention_bias: bool = False
    qk_norm: bool = False
    partial_rotary_factor: float = 1.0
    sliding_window: Optional[int] = None
    # True when every attention layer shares the same sliding window (mistral
    # etc.) — the scheduler may then free out-of-window KV blocks.  False for
    # alternating sliding/full families (gemma-2, gpt-oss): full-attention
    # layers still need old KV, so no blocks may be freed.
    window_uniform: bool = True
    logit_softcapping: Optional[float] = None
    # MLA (DeepSeek-V2/V3): attention over compressed latent KV.  When set,
    # the cache stores [c_kv | k_rope] vectors under one kv head, and rope
    # tables are built for the rope sub-dimension, not head_dim.
    q_lora_rank: Optional[int] = None
    kv_lora_rank: Optional[int] = None
    qk_nope_head_dim: int = 0
    qk_rope_head_dim: int = 0
    v_head_dim: int = 0
    first_k_dense_replace: int = 0
    cache_extra_dim: int = 0       # per-token sidecar cached with K (DSA)
    routed_scaling_factor: float = 1.0
    scoring_func: str = 'softmax'
    n_group: int = 0
    topk_group: int = 0
    # misc
    hf_config: Optional[Dict[str, Any]] = None
    # paged-cache layer count when it differs from num_layers (hybrid models:
    # only full-attention layers hold KV pages)
    num_cache_layers: Optional[int] = None
    quantization_config: Optional[Dict[str, Any]] = None
    # multimodal (None => text-only); holds vision_config + image_token_index etc.
    vision: Optional[Dict[str, Any]] = None

    @property
    def kv_dim(self) -> int:
        return self.num_key_value_heads * self.head_dim

    @property
    def is_mla(self) -> bool:
        return self.kv_lora_rank is not None

    @property
    def cache_head_dim(self) -> int:
        """Per-head KV-cache payload dim: latent+rope vector for MLA models;
        ``cache_extra_dim`` appends per-token sidecar state (DeepSeek-V3.2's
        DSA indexer keys ride the K rows after the latent)."""
        if self.is_mla:
            return (self.kv_lora_rank + self.qk_rope_head_dim
                    + self.cache_extra_dim)
        return self.head_dim + self.cache_extra_dim

    @property
    def rope_dim(self) -> int:
        """Dimension rotary tables are built for (rope sub-dim under MLA,
        partial-rotary fraction for glm4-likes)."""
        if self.is_mla:
            return self.qk_rope_head_dim
        return int(self.head_dim * self.partial_rotary_factor)

    @classmethod
    def from_hf_config(cls, cfg: Dict[str, Any], dtype: str = 'auto') -> 'ModelConfig':
        """Build from a raw HF config dict. Per-arch adjustments live in models/registry."""
        archs = cfg.get('architectures') or ['LlamaForCausalLM']
        vision = None
        if 'thinker_config' in cfg:
            # qwen3-omni: serve the thinker (reference module_map.py:212 maps
            # the full Omni arch to the thinker model); talker/code2wav are
            # generation-side modules outside LLM serving
            cfg = dict(cfg['thinker_config'])
            cfg['architectures'] = archs
            cfg.setdefault('model_type', 'qwen3_omni_moe_thinker')
        if cfg.get('model_type') == 'chatglm' or 'multi_query_group_num' in cfg:
            # legacy THUDM chatglm2/3/glm-4 configs use their own field names
            # (reference: configurations/chatglm.py)
            cfg = dict(cfg)
            cfg.setdefault('num_hidden_layers', cfg.get('num_layers', 28))
            if cfg.get('multi_query_attention'):
                cfg.setdefault('num_key_value_heads',
                               cfg['multi_query_group_num'])
            cfg.setdefault('intermediate_size', cfg.get('ffn_hidden_size'))
            cfg.setdefault('vocab_size', cfg.get('padded_vocab_size', 65024))
            cfg.setdefault('head_dim', cfg.get('kv_channels'))
            cfg.setdefault('rms_norm_eps', cfg.get('layernorm_epsilon', 1e-5))
            cfg.setdefault('max_position_embeddings',
                           cfg.get('seq_length', 8192))
            cfg.setdefault('rope_theta',
                           10000.0 * cfg.get('rope_ratio', 1.0))
            cfg.setdefault('partial_rotary_factor', 0.5)
            cfg.setdefault('attention_bias', cfg.get('add_qkv_bias', False))
            cfg.setdefault('tie_word_embeddings', False)
        if ('vision_config' in cfg or 'text_config' in cfg) and \
                cfg.get('model_type') in (
                'qwen2_vl', 'qwen2_5_vl', 'qwen3_vl', 'qwen3_vl_moe',
                'qwen3_5', 'qwen3_5_moe', 'intern_s2_preview',
                'meta_moe', 'interns2_mobius', 'qwen3_omni_moe_thinker',
                'qwen3_omni_moe'):
            # qwen2-vl: older checkpoints are FLAT (LM fields top-level beside
            # vision_config); transformers>=4.52 nests them under text_config.
            if not cfg.get('architectures'):
                archs = ['Qwen2VLForConditionalGeneration'
                         if cfg['model_type'] == 'qwen2_vl'
                         else 'Qwen2_5_VLForConditionalGeneration']
            inner = cfg.get('text_config') or {
                k: v for k, v in cfg.items() if k != 'vision_config'}
            if 'vision_config' in cfg:
                vision = {
                    'vision_config': dict(cfg['vision_config'],
                                          model_type=cfg['vision_config'].get(
                                              'model_type', cfg['model_type'])),
                    'image_token_index': (cfg.get('image_token_id')
                                          or inner.get('image_token_id',
                                                       151655)),
                    'llm_architectures': ['Qwen2ForCausalLM'],
                    'deepstack': cfg['vision_config'].get(
                        'deepstack_visual_indexes'),
                    # qwen3-omni thinker: audio tower beside the ViT
                    'audio_config': cfg.get('audio_config'),
                    'audio_token_id': cfg.get('audio_token_id'),
                }
            qcfg = dict(inner)
            qcfg['architectures'] = archs
            qcfg.setdefault('model_type', 'qwen2')
            if 'torch_dtype' not in qcfg:
                qcfg['torch_dtype'] = cfg.get('torch_dtype', 'bfloat16')
            cfg = qcfg
        elif 'vision_config' in cfg and ('text_config' in cfg
                                         or 'llm_config' in cfg
                                         or 'language_config' in cfg):
            # composite VLM config: llava family nests the LM as text_config,
            # InternVL as llm_config, deepseek-vl2 as language_config; keep
            # the outer arch for registry dispatch and stash the vision bits
            # for the model builder.
            inner = (cfg.get('text_config') or cfg.get('llm_config')
                     or cfg.get('language_config'))
            vision = {
                'vision_config': cfg['vision_config'],
                'image_token_index': (cfg.get('image_token_index')
                                      or cfg.get('image_token_id')
                                      or (32000 if 'text_config' in cfg
                                          else None)),
                'vision_feature_layer': cfg.get('vision_feature_layer', -2),
                'vision_feature_select_strategy':
                    cfg.get('vision_feature_select_strategy', 'default'),
                'projector_hidden_act': cfg.get('projector_hidden_act', 'gelu'),
                'downsample_ratio': cfg.get('downsample_ratio', 0.5),
                'mm_tokens_per_image': cfg.get('mm_tokens_per_image'),
                'llm_architectures': inner.get('architectures'),
                # interns1_pro: time-series tower config + placeholder id
                'ts_config': cfg.get('ts_config'),
                'ts_token_id': cfg.get('ts_token_id'),
                # deepseek-vl2: projector + tiling layout
                'projector_config': cfg.get('projector_config'),
                'tile_tag': cfg.get('tile_tag'),
                'global_view_pos': cfg.get('global_view_pos'),
                'candidate_resolutions': cfg.get('candidate_resolutions'),
            }
            cfg = dict(inner)
            cfg['architectures'] = archs
            if 'torch_dtype' not in cfg:
                cfg['torch_dtype'] = 'bfloat16'
        elif 'vision_config' in cfg:
            # flat VLM config (minicpmv: LM fields top-level beside
            # vision_config + resampler fields)
            vision = {
                'vision_config': cfg['vision_config'],
                'image_token_index': cfg.get('image_token_id'),
                'query_num': cfg.get('query_num'),
            }
        if 'tie_word_embeddings' not in cfg:
            # nested sub-configs (VLM text_config) omit values equal to the
            # transformers class default — which is True for some families
            # (gemma); resolve the real default instead of assuming False
            try:
                from transformers import CONFIG_MAPPING
                mt = cfg.get('model_type')
                if mt in CONFIG_MAPPING:
                    cfg = dict(cfg)
                    cfg['tie_word_embeddings'] = bool(getattr(
                        CONFIG_MAPPING[mt](), 'tie_word_embeddings', False))
            except Exception:
                pass
        num_heads = cfg.get('num_attention_heads', 32)
        hidden = cfg.get('hidden_size', 4096)
        head_dim = cfg.get('head_dim') or hidden // num_heads
        eos = cfg.get('eos_token_id', 2)
        if eos is None:
            eos = []
        if isinstance(eos, int):
            eos = [eos]
        torch_dtype = cfg.get('torch_dtype', 'bfloat16')
        if dtype == 'auto':
            # TPU has no fast fp16 path distinct from bf16; map half-precision to bf16.
            dtype = 'bfloat16' if torch_dtype in ('float16', 'bfloat16') else 'float32'
        rope_scaling = cfg.get('rope_scaling')
        return cls(
            num_layers=cfg.get('num_hidden_layers', 32),
            num_attention_heads=num_heads,
            num_key_value_heads=cfg.get('num_key_value_heads') or num_heads,
            hidden_size=hidden,
            intermediate_size=cfg.get('intermediate_size', 11008),
            vocab_size=cfg.get('vocab_size', 32000),
            head_dim=head_dim,
            max_position_embeddings=cfg.get('max_position_embeddings', 4096),
            rope_theta=cfg.get('rope_theta', 10000.0),
            rope_scaling=rope_scaling,
            rms_norm_eps=cfg.get('rms_norm_eps',
                                 cfg.get('norm_epsilon',
                                         cfg.get('layer_norm_eps', 1e-6))),
            tie_word_embeddings=cfg.get('tie_word_embeddings', False),
            bos_token_id=cfg.get('bos_token_id', 1),
            eos_token_id=eos,
            dtype=dtype,
            hf_arch=archs[0],
            model_type=cfg.get('model_type', 'llama'),
            num_experts=cfg.get('num_local_experts') or cfg.get('num_experts')
            or cfg.get('n_routed_experts') or 0,
            num_experts_per_tok=cfg.get('num_experts_per_tok', 0),
            moe_intermediate_size=cfg.get('moe_intermediate_size', 0),
            norm_topk_prob=cfg.get('norm_topk_prob', True),
            attention_bias=cfg.get('attention_bias', False)
            or cfg.get('qkv_bias', False),
            partial_rotary_factor=cfg.get('partial_rotary_factor', 1.0),
            sliding_window=cfg.get('sliding_window'),
            window_uniform=(
                not (cfg.get('layer_types')
                     and len(set(cfg['layer_types'])) > 1)
                and cfg.get('model_type') not in ('gemma2', 'gpt_oss')),
            hf_config=cfg,
            quantization_config=cfg.get('quantization_config'),
            vision=vision,
            q_lora_rank=cfg.get('q_lora_rank'),
            kv_lora_rank=cfg.get('kv_lora_rank'),
            qk_nope_head_dim=cfg.get('qk_nope_head_dim', 0),
            qk_rope_head_dim=cfg.get('qk_rope_head_dim', 0),
            v_head_dim=cfg.get('v_head_dim', 0),
            first_k_dense_replace=cfg.get('first_k_dense_replace', 0),
            num_shared_experts=cfg.get('n_shared_experts', 0) or 0,
            routed_scaling_factor=cfg.get('routed_scaling_factor', 1.0),
            scoring_func=cfg.get('scoring_func', 'softmax'),
            n_group=cfg.get('n_group', 0) or 0,
            topk_group=cfg.get('topk_group', 0) or 0,
        )

    @classmethod
    def from_pretrained(cls, model_path: str, dtype: str = 'auto',
                        hf_overrides: Optional[Dict[str, Any]] = None) -> 'ModelConfig':
        cfg_path = os.path.join(model_path, 'config.json')
        with open(cfg_path) as f:
            cfg = json.load(f)
        if hf_overrides:
            cfg.update(hf_overrides)
        return cls.from_hf_config(cfg, dtype=dtype)

    def jnp_dtype(self):
        return _str_dtype(self.dtype)


@dataclass
class CacheConfig:
    """Paged KV-cache geometry (reference analog: pytorch/config.py:108)."""

    block_size: int = 64
    num_gpu_blocks: int = 0          # device (HBM) blocks; 0 = derive from free memory
    num_cpu_blocks: int = 0          # host swap blocks
    cache_max_entry_count: float = 0.8
    quant_policy: QuantPolicy = QuantPolicy.NONE
    max_prefill_token_num: int = 8192
    enable_prefix_caching: bool = False
    window_size: Optional[int] = None

    def num_blocks_for(self, num_tokens: int) -> int:
        return (num_tokens + self.block_size - 1) // self.block_size


@dataclass
class SchedulerConfig:
    """Continuous-batching scheduler knobs (reference analog: pytorch/config.py:86)."""

    max_batch_size: int = 128
    max_session_len: int = 4096
    max_prefill_token_num: int = 8192
    max_prefill_batch: int = 8
    prefill_interval: int = 16       # decode steps between forced prefill scheduling
    eviction_type: str = 'recompute'
    # TTFT-aware prefill ordering (shortest-remaining-first with aging;
    # reference analog: paging/scheduler.py:85 _PrefillReorderer)
    prefill_reorder: bool = True
    prefill_aging_s: float = 10.0    # waited seconds that offset one token budget


@dataclass
class DistConfig:
    """Mesh geometry.  Axes: ('dp', 'tp') today; ('dp','ep','tp','cp') as they land.

    Reference analog: pytorch/config.py:158 (DistConfig with per-layer-type TP groups).
    On TPU the same concept is expressed as distinct PartitionSpecs per layer type over
    one shared device mesh, so "attn_tp vs mlp_tp" is a sharding-rule choice, not a
    process-group choice.
    """

    dp: int = 1
    tp: int = 1
    ep: int = 1
    cp: int = 1
    attn_tp: Optional[int] = None
    mlp_tp: Optional[int] = None

    def __post_init__(self):
        if self.attn_tp is None:
            self.attn_tp = self.tp
        if self.mlp_tp is None:
            self.mlp_tp = self.tp

    @property
    def world_size(self) -> int:
        return self.dp * self.tp * self.ep * self.cp

    def mesh_shape(self):
        return {'dp': self.dp, 'ep': self.ep, 'cp': self.cp, 'tp': self.tp}


@dataclass
class MiscConfig:
    empty_init: bool = False
    prefill_buckets: Optional[List[int]] = None
    decode_buckets: Optional[List[int]] = None
    eager_mode: bool = False
    model_format: Optional[str] = None
    dllm_block_length: int = 0
    dllm_unmasking_strategy: str = 'low_confidence_dynamic'
    dllm_denoising_steps: Optional[int] = None
    dllm_confidence_threshold: float = 0.85
    dllm_mask_token: int = 151669
    memdecode: Optional[Dict] = None


@dataclass
class EngineConfigBundle:
    """All internal configs for one engine (reference analog: engine/config_builder.py)."""

    model: ModelConfig
    cache: CacheConfig
    scheduler: SchedulerConfig
    dist: DistConfig
    misc: MiscConfig

    @classmethod
    def build(cls, model_path: str, engine_config: TpuEngineConfig) -> 'EngineConfigBundle':
        engine_config.validate()
        model = ModelConfig.from_pretrained(model_path, dtype=engine_config.dtype,
                                            hf_overrides=engine_config.hf_overrides)
        session_len = engine_config.session_len or model.max_position_embeddings
        cache = CacheConfig(
            block_size=engine_config.block_size,
            num_gpu_blocks=engine_config.num_gpu_blocks,
            num_cpu_blocks=engine_config.num_cpu_blocks,
            cache_max_entry_count=engine_config.cache_max_entry_count,
            quant_policy=QuantPolicy(engine_config.quant_policy),
            max_prefill_token_num=engine_config.max_prefill_token_num,
            enable_prefix_caching=engine_config.enable_prefix_caching,
            window_size=model.sliding_window if model.window_uniform else None,
        )
        sched = SchedulerConfig(
            max_batch_size=engine_config.max_batch_size or 128,
            max_session_len=session_len,
            max_prefill_token_num=engine_config.max_prefill_token_num,
            max_prefill_batch=engine_config.max_prefill_batch,
        )
        dist = DistConfig(dp=engine_config.dp, tp=engine_config.tp,
                          ep=engine_config.ep, cp=engine_config.cp,
                          attn_tp=engine_config.attn_tp_size,
                          mlp_tp=engine_config.mlp_tp_size)
        misc = MiscConfig(empty_init=engine_config.empty_init,
                          prefill_buckets=engine_config.prefill_buckets,
                          decode_buckets=engine_config.decode_buckets,
                          eager_mode=engine_config.eager_mode,
                          model_format=engine_config.model_format
                          or _detect_model_format(model),
                          memdecode=getattr(engine_config, 'memdecode', None),
                          dllm_block_length=getattr(
                              engine_config, 'dllm_block_length', 0),
                          dllm_unmasking_strategy=getattr(
                              engine_config, 'dllm_unmasking_strategy',
                              'low_confidence_dynamic'),
                          dllm_denoising_steps=getattr(
                              engine_config, 'dllm_denoising_steps', None),
                          dllm_confidence_threshold=getattr(
                              engine_config, 'dllm_confidence_threshold', 0.85),
                          dllm_mask_token=getattr(
                              engine_config, 'dllm_mask_token', 151669))
        return cls(model=model, cache=cache, scheduler=sched, dist=dist, misc=misc)


def _detect_model_format(model: ModelConfig) -> Optional[str]:
    qcfg = model.quantization_config
    if not qcfg:
        return None
    method = qcfg.get('quant_method')
    if method in ('awq', 'gptq'):
        return method
    if method in ('fp8',):
        return 'fp8'
    if method in ('mxfp4',):
        return 'mxfp4'
    if method in ('smooth_quant', 'w8a8'):
        return 'w8a8'
    return None


def next_power_of_2(n: int) -> int:
    """Smallest power of two >= n (used for jit bucket schedules, cf. graph_runner.py:42)."""
    if n <= 1:
        return 1
    return 1 << (int(n - 1).bit_length())


def make_buckets(max_value: int, minimum: int = 1) -> List[int]:
    """Power-of-two bucket schedule up to max_value (TPU analog of CUDA-graph capture sizes)."""
    buckets = []
    b = minimum
    while b < max_value:
        buckets.append(b)
        b *= 2
    buckets.append(max_value)
    return sorted(set(buckets))


def bucketize(value: int, buckets: List[int]) -> int:
    """Smallest bucket >= value."""
    for b in buckets:
        if b >= value:
            return b
    return buckets[-1]
