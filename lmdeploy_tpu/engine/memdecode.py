"""MemDecode: auxiliary memory model fused with the base model per step.

Reference analog: ``lmdeploy/pytorch/memdecode/`` — ``agent.py`` runs a second
("memory") model in lockstep with the base model; ``fusion.py`` mixes their
log-probabilities per token, either with a fixed lambda
(``logaddexp(log(1-l) + base_lp, log(l) + mem_lp)``) or with a learned
RouterNetwork MLP predicting per-token [base, memory] log-weights from both
models' hidden states plus scalar confidence/entropy features.

TPU-native design: instead of a second agent with its own engine plumbing,
``MemDecodeModel`` is a COMPOSITE model — its params hold both models' params
(plus the memory model's rope tables and the router weights), and its KV
cache is a pytree ``{'pages': base, 'mem_pages': memory}``.  Every existing
engine mechanism (jit buckets, k-step decode runs, donation, chunked prefill,
PD migration — cache leaves all have blocks at dim 1) then works unchanged;
the fusion is just extra math inside one jitted forward.
"""
from __future__ import annotations

import json
import math
import os
import re
from typing import Dict, Optional

import numpy as np

DEFAULT_ROUTER_CONFIG = {
    'num_layers': 2,
    'input_mode': 'both',
    'use_scalars': True,
    'scalar_proj_dim': 64,
    'hidden_dim': 128,
    'dropout': 0.2,
}


# ---------------------------------------------------------------- fusion ----

def align_logits(logits, base_vocab: int):
    """Slice / -inf-pad the vocab dim to the base model's size (reference
    fusion.py align_logits_to_base)."""
    import jax.numpy as jnp
    v = logits.shape[-1]
    if v == base_vocab:
        return logits
    if v > base_vocab:
        return logits[..., :base_vocab]
    pad = jnp.full(logits.shape[:-1] + (base_vocab - v,), -jnp.inf,
                   logits.dtype)
    return jnp.concatenate([logits, pad], axis=-1)


def _entropy(probs, log_probs):
    import jax.numpy as jnp
    finite = jnp.where(jnp.isfinite(log_probs), log_probs, 0.0)
    return -(probs * finite).sum(-1)


def _router_apply(router: Dict, cfg: Dict, base_h, mem_h, scalars):
    """RouterNetwork forward (reference fusion.py RouterNetwork): optional
    per-scalar Linear+ReLU projectors, then an MLP (Linear [+GELU] stack,
    dropout = identity at inference) -> log_softmax over 2 weights."""
    import jax
    import jax.numpy as jnp

    mode = cfg.get('input_mode', 'both')
    if mode == 'both':
        x = jnp.concatenate([base_h, mem_h], axis=-1)
    else:                                   # memory_only / mem_hidden_both_scalars
        x = mem_h
    x = x.astype(jnp.float32)
    if cfg.get('use_scalars', True):
        if router.get('scalar_projectors'):
            proj = [jax.nn.relu(scalars[..., i:i + 1] @ w.T + b)
                    for i, (w, b) in enumerate(router['scalar_projectors'])]
            scalars = jnp.concatenate(proj, axis=-1)
        x = jnp.concatenate([x, scalars.astype(jnp.float32)], axis=-1)
    layers = router['mlp']
    for i, (w, b) in enumerate(layers):
        x = x @ w.T + b
        if i + 1 < len(layers):
            x = jax.nn.gelu(x)
    return jax.nn.log_softmax(x, axis=-1)    # [..., 2]


def fuse_logits(base_logits, mem_logits, base_vocab: int,
                lambda_value: float = 1.0,
                router: Optional[Dict] = None,
                router_config: Optional[Dict] = None,
                base_h=None, mem_h=None,
                base_only_threshold: float = -1.0):
    """Mix base/memory log-probs; returns fused scores on a base-logit-like
    scale (the base row normalizer is restored so repetition penalties see
    positive-scale scores — reference fusion.py forward)."""
    import jax
    import jax.numpy as jnp
    from jax.scipy.special import logsumexp

    base_logits = align_logits(base_logits.astype(jnp.float32), base_vocab)
    mem_logits = align_logits(mem_logits.astype(jnp.float32), base_vocab)
    base_norm = logsumexp(base_logits, axis=-1, keepdims=True)
    blp = jax.nn.log_softmax(base_logits, axis=-1)
    mlp_ = jax.nn.log_softmax(mem_logits, axis=-1)

    if router is not None:
        mode = router_config.get('input_mode', 'both')
        bp, mp = jnp.exp(blp), jnp.exp(mlp_)
        if mode == 'memory_only':
            scalars = jnp.stack([mp.max(-1), _entropy(mp, mlp_)], axis=-1)
        else:
            scalars = jnp.stack([bp.max(-1), _entropy(bp, blp),
                                 mp.max(-1), _entropy(mp, mlp_)], axis=-1)
        lw = _router_apply(router, router_config, base_h, mem_h, scalars)
        lw = lw.astype(blp.dtype)
        if base_only_threshold >= 0.0:
            base_only = jnp.exp(lw[..., 1]) <= base_only_threshold
            lw0 = jnp.where(base_only, 0.0, lw[..., 0])
            lw1 = jnp.where(base_only, -jnp.inf, lw[..., 1])
            lw = jnp.stack([lw0, lw1], axis=-1)
        fused = jnp.logaddexp(blp + lw[..., 0:1], mlp_ + lw[..., 1:2])
    elif lambda_value <= 0.0:
        return base_logits
    elif lambda_value >= 1.0:
        return mem_logits
    else:
        fused = jnp.logaddexp(blp + math.log1p(-lambda_value),
                              mlp_ + math.log(lambda_value))
    return fused + base_norm


# ---------------------------------------------------------------- router IO --

def load_router(router_path: str):
    """Resolve config + checkpoint like the reference (dir with numbered
    checkpoints + router_config.json, or a direct file) and return
    (config dict, params {'scalar_projectors': [(w, b)...], 'mlp': [(w, b)...]})."""
    if os.path.isdir(router_path):
        cands = sorted(
            [os.path.join(router_path, f) for f in os.listdir(router_path)
             if f.endswith(('.pt', '.safetensors'))],
            key=lambda p: (_ckpt_number(p), p.endswith('.safetensors'), p))
        assert cands, f'no router checkpoints in {router_path}'
        ckpt = cands[-1]
        cfg_path = os.path.join(router_path, 'router_config.json')
    else:
        ckpt = router_path
        cfg_path = os.path.join(os.path.dirname(router_path),
                                'router_config.json')

    cfg = dict(DEFAULT_ROUTER_CONFIG)
    state: Dict[str, np.ndarray] = {}
    if ckpt.endswith('.safetensors'):
        from safetensors.numpy import load_file
        state = load_file(ckpt)
    else:
        import torch
        raw = torch.load(ckpt, map_location='cpu', weights_only=False)
        if isinstance(raw, dict):
            cfg.update(raw.get('router_config', raw.get('config', {})) or {})
            sd = None
            for key in ('state_dict', 'router_state_dict', 'model_state_dict'):
                if raw.get(key) is not None:
                    sd = raw[key]
                    break
            if sd is None:
                sd = raw
            state = {k: v.numpy() for k, v in sd.items()
                     if hasattr(v, 'numpy')}
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            cfg.update(json.load(f))

    projs = []
    i = 0
    while f'scalar_projectors.{i}.0.weight' in state:
        projs.append((np.asarray(state[f'scalar_projectors.{i}.0.weight'],
                                 np.float32),
                      np.asarray(state[f'scalar_projectors.{i}.0.bias'],
                                 np.float32)))
        i += 1
    mlp = []
    idxs = sorted({int(m.group(1)) for k in state
                   if (m := re.match(r'mlp\.(\d+)\.weight', k))})
    for j in idxs:
        mlp.append((np.asarray(state[f'mlp.{j}.weight'], np.float32),
                    np.asarray(state[f'mlp.{j}.bias'], np.float32)))
    assert mlp, f'router checkpoint {ckpt} has no mlp.*.weight tensors'
    return cfg, {'scalar_projectors': projs, 'mlp': mlp}


def _ckpt_number(path: str) -> int:
    m = re.findall(r'\d+', os.path.splitext(os.path.basename(path))[0])
    return int(m[-1]) if m else -1


# ---------------------------------------------------------------- composite --

class MemDecodeModel:
    """Composite base+memory model presenting the standard model interface.

    params: {'base': ..., 'mem': ..., 'mem_rope': (cos, sin)[, 'router': ...]}
    cache:  {'pages': base pages, 'mem_pages': memory pages} — both leaves
    have blocks at dim 1, so swap/migration/host pools treat them uniformly.
    """

    def __init__(self, base_model, mem_model, md_cfg: Dict):
        self.base = base_model
        self.mem = mem_model
        self.config = base_model.config
        self.mem_config = mem_model.config
        self.lambda_value = float(md_cfg.get('lambda_value', 1.0))
        self.adaptive = bool(md_cfg.get('adaptive_router', False))
        self.base_only_threshold = float(
            md_cfg.get('lambda_base_only_threshold', -1.0))
        self.router_config: Optional[Dict] = None
        self.uses_mrope = False
        self.has_linear_state = False

    def __getattr__(self, name):
        # model-surface attributes the agent probes (image markers, flags)
        # delegate to the base model
        return getattr(self.__dict__['base'], name)

    def init_params(self, rng):
        import jax
        p = {'base': self.base.init_params(rng),
             'mem': self.mem.init_params(
                 jax.random.fold_in(rng, 1) if rng is not None else None)}
        p['mem_rope'] = self._mem_rope()
        return p

    def _mem_rope(self):
        import jax.numpy as jnp

        from ..nn.layers import make_rope_table
        c = self.mem_config
        cos, sin = make_rope_table(c.rope_dim, c.max_position_embeddings,
                                   c.rope_theta, c.rope_scaling)
        return (jnp.asarray(cos), jnp.asarray(sin))

    def forward(self, params, input_ids, positions, kv_cache, meta,
                rope_cos, rope_sin, return_all_logits: bool = False,
                **kw):
        import jax.numpy as jnp

        want_h = self.adaptive
        base_out = self.base.forward(
            params['base'], input_ids, positions, kv_cache['pages'], meta,
            rope_cos, rope_sin, return_all_logits=return_all_logits,
            return_hidden=want_h, **kw)
        mcos, msin = params['mem_rope']
        T = mcos.shape[0]
        mem_out = self.mem.forward(
            params['mem'], input_ids,
            jnp.clip(positions, 0, T - 1), kv_cache['mem_pages'], meta,
            mcos, msin, return_all_logits=return_all_logits,
            return_hidden=want_h)
        if want_h:
            b_logits, b_pages, b_h = base_out
            m_logits, m_pages, m_h = mem_out
        else:
            b_logits, b_pages = base_out
            m_logits, m_pages = mem_out
            b_h = m_h = None
        fused = fuse_logits(
            b_logits, m_logits, self.config.vocab_size,
            lambda_value=self.lambda_value,
            router=params.get('router') if self.adaptive else None,
            router_config=self.router_config,
            base_h=b_h, mem_h=m_h,
            base_only_threshold=self.base_only_threshold)
        return fused.astype(b_logits.dtype), \
            {'pages': b_pages, 'mem_pages': m_pages}


def build_memdecode(base_model, base_params, md_cfg: Dict, configs):
    """Wrap the already-built base model/params into the composite.

    Returns (MemDecodeModel, combined params).  The memory model loads with
    the same weight-loader machinery as any checkpoint.
    """
    from ..config import ModelConfig
    from ..models import build_model
    from ..weight_loader import load_model_params

    path = md_cfg['memory_model_path']
    mem_cfg = ModelConfig.from_pretrained(path, dtype=configs.model.dtype)
    mem_model = build_model(mem_cfg)
    mem_params = load_model_params(mem_model, path, None, None)

    assert not getattr(base_model, 'has_linear_state', False), \
        'memdecode does not support hybrid linear-attention base models'
    comp = MemDecodeModel(base_model, mem_model, md_cfg)
    params = {'base': base_params, 'mem': mem_params,
              'mem_rope': comp._mem_rope()}
    if comp.adaptive:
        rcfg, router = load_router(md_cfg['router_path'])
        comp.router_config = rcfg
        import jax.numpy as jnp
        params['router'] = {
            'scalar_projectors': [(jnp.asarray(w), jnp.asarray(b))
                                  for w, b in router['scalar_projectors']],
            'mlp': [(jnp.asarray(w), jnp.asarray(b))
                    for w, b in router['mlp']],
        }
    return comp, params
