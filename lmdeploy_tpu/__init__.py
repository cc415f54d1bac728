"""lmdeploy_tpu: TPU-native LLM serving framework (JAX/XLA/Pallas).

A from-scratch reimplementation of InternLM/lmdeploy's capability set for TPU:
paged-KV continuous batching, chunked prefill, fused on-device sampling, quantized
serving (W4A16/W8A8/FP8/KV8/KV4), OpenAI/Anthropic-compatible serving, and multi-chip
sharding via jax.sharding — designed for XLA, not translated from CUDA.
"""
from .api import pipeline, serve  # noqa: F401
from .chat_template import ChatTemplateConfig  # noqa: F401
from .messages import (EngineOutput, GenerationConfig, PytorchEngineConfig,  # noqa: F401
                       QuantPolicy, Response, ResponseType, TpuEngineConfig)
from .tokenizer import Tokenizer  # noqa: F401

__version__ = '0.1.0'
