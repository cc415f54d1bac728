"""Public factory functions.

Reference analog: ``lmdeploy/api.py:15`` (``pipeline()``).
"""
from __future__ import annotations

from typing import Optional

from .chat_template import ChatTemplateConfig
from .messages import TpuEngineConfig
from .pipeline import Pipeline


def pipeline(model_path: str,
             backend_config: Optional[TpuEngineConfig] = None,
             chat_template_config: Optional[ChatTemplateConfig] = None,
             log_level: str = 'WARNING',
             adapters: Optional[dict] = None,
             **kwargs) -> Pipeline:
    """Build an inference pipeline over the TPU engine.

    Example::

        from lmdeploy_tpu import pipeline
        pipe = pipeline('TinyLlama/TinyLlama-1.1B-Chat-v1.0')
        print(pipe(['Hi, pls intro yourself']))

    ``adapters={name: peft_path}`` loads S-LoRA slots; pick one per request via
    ``GenerationConfig(adapter_name=...)`` (reference: api.py pipeline adapters).
    """
    if adapters:
        backend_config = backend_config or TpuEngineConfig()
        backend_config.adapters = dict(adapters)
    return Pipeline(model_path, backend_config=backend_config,
                    chat_template_config=chat_template_config,
                    log_level=log_level, **kwargs)


def serve(model_path: str, server_name: str = '0.0.0.0', server_port: int = 23333,
          backend_config: Optional[TpuEngineConfig] = None, **kwargs):
    """Launch the OpenAI-compatible API server (reference: lmdeploy/api.py serve)."""
    from .serve.api_server import serve as _serve
    return _serve(model_path, server_name=server_name, server_port=server_port,
                  backend_config=backend_config, **kwargs)
