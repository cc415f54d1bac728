"""MiniCPM / MiniCPM3 causal LMs.

Reference analog: ``lmdeploy/pytorch/models/minicpm3.py``.  Both generations
are muP-scaled ("tensor program") models:

  * embeddings scaled by ``scale_emb``
  * every residual branch scaled by ``scale_depth / sqrt(num_layers)``
  * logits computed from ``hidden / (hidden_size / dim_model_base)``

MiniCPM (v1/2) is llama attention with those scalings; MiniCPM3 swaps in
DeepSeek-style MLA (q_lora/kv_lora compressed latents, absorbed attention —
reused wholesale from ``models/deepseek.py`` with an all-dense layer stack,
``first_k_dense_replace == num_layers``).

These scalings are exactly equivalent to folding ``scale_emb`` into the
embedding, the residual scale into wo/w_down, and the logit scale into
lm_head — tests/test_minicpm.py exploits that for token-exact checks against
the plain llama / deepseek paths.
"""
from __future__ import annotations

from ..config import ModelConfig
from .deepseek import DeepseekV2Model
from .llama import LlamaModel


def _mup(model, config: ModelConfig):
    hf = config.hf_config or {}
    model.embed_scale = float(hf.get('scale_emb', 1.0))
    sd = hf.get('scale_depth')
    if sd:
        model.residual_scale = float(sd) / float(config.num_layers) ** 0.5
    dmb = hf.get('dim_model_base')
    if dmb:
        model.logit_scale = float(dmb) / float(config.hidden_size)


class MiniCPMModel(LlamaModel):
    """MiniCPM v1/2: llama + muP scalings (tied embeddings in most ckpts)."""

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        _mup(self, config)
        self.logit_scale = getattr(self, 'logit_scale', None)

    def _head(self, params, x):
        logits = super()._head(params, x)
        if self.logit_scale is not None:
            logits = logits * self.logit_scale
        return logits


class MiniCPM3Model(DeepseekV2Model):
    """MiniCPM3: MLA attention + muP scalings, all layers dense."""

    def __init__(self, config: ModelConfig):
        # all-dense: the deepseek moe group is empty
        config.first_k_dense_replace = config.num_layers
        super().__init__(config)
        _mup(self, config)
