"""Qwen3.5 / Qwen3.5-MoE: hybrid gated-DeltaNet VLMs (+ InternS2-Preview).

Reference analog: ``lmdeploy/pytorch/models/qwen3_5.py`` /
``qwen3_5_moe.py`` / ``qwen3_5_mtp.py``.  Architecturally Qwen3-Next (gated
DeltaNet linear attention interleaved with gated full attention) with four
deltas, all handled here on top of :class:`Qwen3NextModel`:

  * **split input projections** — the checkpoint stores ``in_proj_qkv``
    ([q_all | k_all | v_all] — NOT the per-key-head interleave of
    qwen3-next's fused ``in_proj_qkvz``), a separate ``in_proj_z``, and
    separate ``in_proj_b`` / ``in_proj_a`` (reference
    ``Qwen3_5GatedDeltaNet.__init__`` builds in_proj_qkv/in_proj_z/in_proj_ba
    and merges b|a at load: ``qwen3_5.py:1215`` stacked_params_mapping);
  * **dense variant** — Qwen3_5ForConditionalGeneration has a plain
    gate/up/down mlp (``Qwen3_5MLP``); the MoE variant keeps qwen3-next's
    softmax-topk router + sigmoid-gated shared expert unchanged;
  * **native VLM** — the LM nests under ``model.language_model.`` beside a
    ``model.visual`` tower: the Qwen3-VL encoder (bilinear pos-embed
    interpolation, full per-frame attention) WITHOUT deepstack taps, plus
    lane-interleaved mrope (reference reuses Qwen3VLInputProcessor);
  * **MoE expert stacking** — bf16 checkpoints ship experts FUSED as
    ``experts.gate_up_proj`` [E, 2I, H] / ``experts.down_proj`` [E, H, I]
    (reference ``_load_weight_fused_experts``); per-expert names are also
    accepted (fp8 checkpoints).

The MTP proposer (``Qwen3_5MTP``) lives in this file too: one gated
full-attention layer over ``fc([pre_fc_norm_embedding(emb);
pre_fc_norm_hidden(h)])`` with weights under the target checkpoint's
``mtp.`` prefix (reference ``qwen3_5_mtp.py``).
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ..config import ModelConfig
from .mixtral import _ExpertSlice
from .qwen3_next import Qwen3NextModel


class Qwen3_5TextModel(Qwen3NextModel):
    """Qwen3.5 text decoder (dense or MoE via config.num_experts).

    The MetaMoE family (reference ``meta_moe.py`` MetaMoeForConditionalGeneration
    and its rename ``interns2_mobius.py``) shares ``num_meta_moe_blocks``
    expert stacks ROUND-ROBIN across all layers (layer L uses meta block
    ``L % NM``, reference ``meta_mlp[self.layer_idx % len(meta_mlp)]``) while
    keeping per-layer shared experts.  With NM equal to the full-attention
    interval (the only shipped geometry), the meta index is static per
    position-in-block, so the stacks live in a top-level ``meta_mlp`` param
    group indexed by ``j`` — no dynamic gather in the layer scan.
    """

    def __init__(self, config: ModelConfig):
        hf = config.hf_config or {}
        arch = config.hf_arch or ''
        self.n_meta = 0
        if arch.startswith(('MetaMoe', 'InternS2Mobius')):
            self.n_meta = int(hf.get('num_meta_moe_blocks')
                              or hf.get('num_blocks') or 4)
        super().__init__(config)
        self.is_moe = bool(self.n_experts)
        if self.n_meta:
            assert self.n_meta == self.interval, \
                ('meta-MoE blocks must equal the full-attention interval '
                 f'(got {self.n_meta} vs {self.interval}); the round-robin '
                 'index is only static under that geometry')

    # -- split input projections -----------------------------------------------------------
    def _lin_in_shapes(self) -> Dict[str, int]:
        return {
            'in_qkv': self.key_dim * 2 + self.value_dim,
            'in_z': self.value_dim,
            'in_ba': 2 * self.lin_hv,
        }

    def _delta_proj(self, w, j, x):
        """Split-projection layout: qkv = [q_all | k_all | v_all], z
        separate, ba = [b_all | a_all] (reference Qwen3_5GatedDeltaNet
        .forward + fix_ba_ordering)."""
        import jax.numpy as jnp
        B, T, _ = x.shape
        hk, hv, dk, dv = self.lin_hk, self.lin_hv, self.lin_dk, self.lin_dv
        kd = self.key_dim
        qkv = jnp.dot(x, w['lin_in_qkv'][j])
        q = qkv[..., :kd].reshape(B, T, hk, dk)
        k = qkv[..., kd:2 * kd].reshape(B, T, hk, dk)
        v = qkv[..., 2 * kd:].reshape(B, T, hv, dv)
        z = jnp.dot(x, w['lin_in_z'][j]).reshape(B, T, hv, dv)
        ba = jnp.dot(x, w['lin_in_ba'][j])
        b = ba[..., :hv]
        a = ba[..., hv:]
        return q, k, v, z, b, a

    def _plan_lin_in(self, plan, q: str, blk: int, j: int, T):
        hv = self.lin_hv
        plan[q + 'in_proj_qkv.weight'] = \
            (('blocks', 'lin_in_qkv', blk, j), T, None)
        plan[q + 'in_proj_z.weight'] = \
            (('blocks', 'lin_in_z', blk, j), T, None)
        # separate HF tensors land in halves of the stacked ba projection
        plan[q + 'in_proj_b.weight'] = \
            (('blocks', 'lin_in_ba', blk, j), T, slice(0, hv))
        plan[q + 'in_proj_a.weight'] = \
            (('blocks', 'lin_in_ba', blk, j), T, slice(hv, 2 * hv))

    # -- dense mlp variant -----------------------------------------------------------------
    def _mlp_shapes(self, NB: int, IV: int, H: int) -> Dict[str, Any]:
        if self.n_experts:
            shapes = super()._mlp_shapes(NB, IV, H)
            if self.n_meta:
                # expert stacks + router live in the shared top-level
                # meta_mlp group (see param_shapes); only the per-layer
                # shared expert stays per-block
                for k in ('router', 'we_gate', 'we_up', 'we_down'):
                    shapes.pop(k, None)
            return shapes
        I = self.config.intermediate_size
        return {
            'mlp_gate': (NB, IV, H, I),
            'mlp_up': (NB, IV, H, I),
            'mlp_down': (NB, IV, I, H),
        }

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        if self.n_meta:
            NM, H, E, I = (self.n_meta, self.config.hidden_size,
                           self.n_experts, self.moe_inter)
            shapes['meta_mlp'] = {
                'router': (NM, H, E),
                'we_gate': (NM, E, H, I),
                'we_up': (NM, E, H, I),
                'we_down': (NM, E, I, H),
            }
        return shapes

    def forward(self, params, *args, **kwargs):
        if self.n_meta:
            # stashed for _moe inside the block scan (static j indexing;
            # re-bound on every trace so jit caching stays correct)
            self._meta_w = params['meta_mlp']
        return super().forward(params, *args, **kwargs)

    def _moe(self, w, j, x):
        import jax
        import jax.numpy as jnp
        if self.n_meta:
            from ..ops.moe import moe_ffn
            mw = self._meta_w
            mi = j % self.n_meta                       # static meta index
            B, T, H = x.shape
            xf = x.reshape(B * T, H)
            logits = jnp.dot(xf, mw['router'][mi],
                             preferred_element_type=jnp.float32)
            probs = jax.nn.softmax(logits, axis=-1)
            top_w, top_idx = jax.lax.top_k(probs, self.top_k)
            if self.norm_topk:
                top_w = top_w / (top_w.sum(-1, keepdims=True) + 1e-20)
            out = moe_ffn(xf, top_idx, top_w, mw['we_gate'][mi],
                          mw['we_up'][mi], mw['we_down'][mi], x.dtype,
                          allow_ragged=not getattr(self, 'ep_sharded', False))
            s = jax.nn.silu(jnp.dot(xf, w['ws_gate'][j],
                                    preferred_element_type=jnp.float32))
            s = s * jnp.dot(xf, w['ws_up'][j],
                            preferred_element_type=jnp.float32)
            s = jnp.dot(s.astype(x.dtype), w['ws_down'][j],
                        preferred_element_type=jnp.float32)
            sg = jax.nn.sigmoid(jnp.dot(xf, w['ws_out_gate'][j],
                                        preferred_element_type=jnp.float32))
            out = out + s * sg[:, None]
            return out.reshape(B, T, H).astype(x.dtype)
        if self.n_experts:
            return super()._moe(w, j, x)
        g = jax.nn.silu(jnp.dot(x, w['mlp_gate'][j],
                                preferred_element_type=jnp.float32))
        u = jnp.dot(x, w['mlp_up'][j], preferred_element_type=jnp.float32)
        y = jnp.dot((g * u).astype(x.dtype), w['mlp_down'][j])
        return y.astype(x.dtype)

    def _plan_mlp(self, plan, m: str, blk: int, j: int, T):
        if self.n_meta:
            # per-layer leaves are just the shared expert; stacks load into
            # the top-level meta_mlp group (see make_assign_plan)
            plan[m + 'shared_expert.gate_proj.weight'] = \
                (('blocks', 'ws_gate', blk, j), T, None)
            plan[m + 'shared_expert.up_proj.weight'] = \
                (('blocks', 'ws_up', blk, j), T, None)
            plan[m + 'shared_expert.down_proj.weight'] = \
                (('blocks', 'ws_down', blk, j), T, None)
            plan[m + 'shared_expert_gate.weight'] = \
                (('blocks', 'ws_out_gate', blk, j),
                 lambda x: np.asarray(x).reshape(-1), None)
            return
        if not self.n_experts:
            plan[m + 'gate_proj.weight'] = \
                (('blocks', 'mlp_gate', blk, j), T, None)
            plan[m + 'up_proj.weight'] = \
                (('blocks', 'mlp_up', blk, j), T, None)
            plan[m + 'down_proj.weight'] = \
                (('blocks', 'mlp_down', blk, j), T, None)
            return
        super()._plan_mlp(plan, m, blk, j, T)
        # bf16 checkpoints fuse the expert stack (reference
        # qwen3_5_moe.py _load_weight_fused_experts): gate_up [E, 2I, H]
        # row-split per expert, down [E, H, I]
        I = self.moe_inter

        def gate_of(x):
            return np.ascontiguousarray(np.swapaxes(x[:, :I, :], -1, -2))

        def up_of(x):
            return np.ascontiguousarray(np.swapaxes(x[:, I:, :], -1, -2))

        def down_of(x):
            return np.ascontiguousarray(np.swapaxes(x, -1, -2))

        plan[m + 'experts.gate_up_proj'] = [
            (('blocks', 'we_gate', blk, j),
             lambda x, f=gate_of: f(np.asarray(x)), None),
            (('blocks', 'we_up', blk, j),
             lambda x, f=up_of: f(np.asarray(x)), None),
        ]
        plan[m + 'experts.down_proj'] = \
            (('blocks', 'we_down', blk, j),
             lambda x: down_of(np.asarray(x)), None)

    def make_assign_plan(self):
        """Qwen3.5 checkpoints always nest the LM under
        ``model.language_model.`` (the arch is a ConditionalGeneration VLM
        even for text-only serving); keep the bare ``model.`` spellings too
        for hand-built text-only checkpoints."""
        base = super().make_assign_plan()
        if self.n_meta:
            self._plan_meta(base)
        plan = dict(base)
        for k, v in base.items():
            if k.startswith('model.'):
                plan['model.language_model.' + k[len('model.'):]] = v
        return plan

    def _plan_meta(self, plan):
        """Shared meta expert stacks (reference meta_moe.py load_weights:
        ``meta_experts_gate.{i}`` -> router, ``meta_experts.{i}`` -> stack;
        fused bf16 gate_up/down layout, per-expert names for fp8)."""
        from .mixtral import _ExpertSlice
        I = self.moe_inter

        def T(x):
            return np.ascontiguousarray(np.swapaxes(np.asarray(x), -1, -2))

        def gate_of(x):
            return np.ascontiguousarray(
                np.swapaxes(np.asarray(x)[:, :I, :], -1, -2))

        def up_of(x):
            return np.ascontiguousarray(
                np.swapaxes(np.asarray(x)[:, I:, :], -1, -2))

        def down_of(x):
            return np.ascontiguousarray(np.swapaxes(np.asarray(x), -1, -2))

        for i in range(self.n_meta):
            plan[f'model.meta_experts_gate.{i}.weight'] = \
                (('meta_mlp', 'router', i), T, None)
            b = f'model.meta_experts.{i}.'
            plan[b + 'gate_up_proj'] = [
                (('meta_mlp', 'we_gate', i), gate_of, None),
                (('meta_mlp', 'we_up', i), up_of, None),
            ]
            plan[b + 'down_proj'] = (('meta_mlp', 'we_down', i), down_of, None)
            for e in range(self.n_experts):
                x = b + f'{e}.'
                plan[x + 'gate_proj.weight'] = \
                    (('meta_mlp', 'we_gate', i), T, _ExpertSlice(e))
                plan[x + 'up_proj.weight'] = \
                    (('meta_mlp', 'we_up', i), T, _ExpertSlice(e))
                plan[x + 'down_proj.weight'] = \
                    (('meta_mlp', 'we_down', i), T, _ExpertSlice(e))


class Qwen3_5MTP(Qwen3_5TextModel):
    """Qwen3.5 Multi-Token-Prediction module as a speculative proposer.

    Reference: ``lmdeploy/pytorch/models/qwen3_5_mtp.py`` — the draft input
    is ``fc([pre_fc_norm_embedding(embed(tok)) ; pre_fc_norm_hidden(h)])``
    followed by ONE gated full-attention decoder layer (dense or MoE mlp
    matching the target), with the module's own final norm and the target's
    lm_head.  Weights live in the target checkpoint under the ``mtp.``
    prefix; embeddings/lm_head are shared with the target.

    ``step`` matches ``EagleHead.step`` so the feature-conditioned spec
    machinery (engine/spec_agent.py) drives it; the draft layer itself has
    no linear state — only the TARGET's verify pass needs state rollback
    (see spec_agent's hybrid snapshot handling).
    """

    def param_shapes(self) -> Dict[str, Any]:
        cfg = self.config
        H, D = cfg.hidden_size, cfg.head_dim
        nh, nkv = cfg.num_attention_heads, cfg.num_key_value_heads
        layer = {
            'attn_norm': (H,), 'mlp_norm': (H,),
            'fa_wq': (H, nh * 2 * D),            # query | gate per head
            'fa_wk': (H, nkv * D), 'fa_wv': (H, nkv * D),
            'fa_wo': (nh * D, H),
            'fa_q_norm': (D,), 'fa_k_norm': (D,),
        }
        # mlp shapes with the (NB, IV) block prefix collapsed to a single
        # leading 1 so _moe(w, 0, x) indexes them like a per-block slice
        layer.update({k: (1,) + v[2:]
                      for k, v in self._mlp_shapes(1, 1, H).items()})
        return {
            'pre_norm_emb': (H,),
            'pre_norm_hidden': (H,),
            'fc': (2 * H, H),
            'final_norm': (H,),
            'layer': layer,
        }

    def make_assign_plan(self):
        def T(x):
            return np.ascontiguousarray(np.swapaxes(x, -1, -2))

        ident = lambda x: x  # noqa: E731
        plus1 = lambda x: np.asarray(x, np.float32) + 1.0  # noqa: E731
        # reference rms_norm_keys: mtp.norm, pre_fc_norm_*, input_layernorm,
        # post_attention_layernorm, q_norm, k_norm are all zero-centered
        plan: Dict[str, Any] = {
            'mtp.pre_fc_norm_embedding.weight': (('pre_norm_emb',), plus1,
                                                 None),
            'mtp.pre_fc_norm_hidden.weight': (('pre_norm_hidden',), plus1,
                                              None),
            'mtp.fc.weight': (('fc',), T, None),
            'mtp.norm.weight': (('final_norm',), plus1, None),
        }
        p = 'mtp.layers.0.'
        plan[p + 'input_layernorm.weight'] = (('layer', 'attn_norm'), plus1,
                                              None)
        plan[p + 'post_attention_layernorm.weight'] = \
            (('layer', 'mlp_norm'), plus1, None)
        q = p + 'self_attn.'
        plan[q + 'q_proj.weight'] = (('layer', 'fa_wq'), T, None)
        plan[q + 'k_proj.weight'] = (('layer', 'fa_wk'), T, None)
        plan[q + 'v_proj.weight'] = (('layer', 'fa_wv'), T, None)
        plan[q + 'o_proj.weight'] = (('layer', 'fa_wo'), T, None)
        plan[q + 'q_norm.weight'] = (('layer', 'fa_q_norm'), plus1, None)
        plan[q + 'k_norm.weight'] = (('layer', 'fa_k_norm'), plus1, None)
        # reuse the text model's mlp plan, re-rooted at the mtp layer:
        # ('blocks', name, blk, j) -> ('layer', name, 0)
        sub: Dict[str, Any] = {}
        self._plan_mlp(sub, '', 0, 0, T)
        for k, v in sub.items():
            entries = v if isinstance(v, list) else [v]
            moved = [(('layer', e[0][1], 0), e[1], e[2]) for e in entries]
            plan[p + 'mlp.' + k] = moved if isinstance(v, list) else moved[0]
        return plan

    # -- draft step (EagleHead-compatible) -------------------------------------------------
    def step(self, params, tparams, h_cond, token, position, kv_cache,
             block_tables, q_lens, cos_tab, sin_tab, max_len):
        """One MTP draft step: ``h_cond`` [B, H] target pre-final-norm
        features; returns (logits [B, V], h_new [B, H], kv_cache)."""
        import jax.numpy as jnp
        from ..nn.layers import rms_norm
        from ..ops.attention import compute_slot_mapping
        from .llama import AttnMeta
        cfg = self.config

        emb = tparams['embed'][token].astype(h_cond.dtype)          # [B, H]
        x = jnp.concatenate(
            [rms_norm(emb, params['pre_norm_emb'], cfg.rms_norm_eps),
             rms_norm(h_cond, params['pre_norm_hidden'], cfg.rms_norm_eps)],
            axis=-1) @ params['fc']
        xt = x[:, None, :]

        pos = jnp.clip(position, 0, max_len - 1)[:, None]
        cos, sin = cos_tab[pos], sin_tab[pos]
        slot = compute_slot_mapping(block_tables, position, q_lens, 1,
                                    kv_cache.shape[3])
        meta = AttnMeta(block_tables=block_tables, history_lens=position,
                        q_lens=q_lens)
        w = params['layer']
        h = rms_norm(xt, w['attn_norm'], cfg.rms_norm_eps)
        y, kv_cache = self._full_attn(w, jnp.int32(0), h, kv_cache, meta,
                                      cos, sin, slot, False)
        h = xt + y
        y = rms_norm(h, w['mlp_norm'], cfg.rms_norm_eps)
        h = h + self._moe(w, 0, y)
        h_new = h[:, 0]

        lm_head = tparams.get('lm_head')
        if lm_head is None:
            lm_head = tparams['embed'].T
        hn = rms_norm(h_new, params['final_norm'], cfg.rms_norm_eps)
        logits = jnp.dot(hn, lm_head, preferred_element_type=jnp.float32)
        return logits, h_new, kv_cache


class _Qwen3_5VLMixin:
    """Vision surface: the Qwen3-VL tower without deepstack taps (the
    qwen3_5 vision config carries no ``deepstack_visual_indexes``, so
    ``Qwen3VLTower.ds_idx == ()`` and features stay H-wide), plus
    lane-interleaved mrope.  Reference ``Qwen3_5VisionModel`` +
    Qwen3VLInputProcessor reuse (``qwen3_5.py:184, 38``)."""

    def _init_vision(self, config: ModelConfig):
        from .qwen3_vl import _Qwen3VLMixin
        _Qwen3VLMixin._init_vision(self, config)
        scaling = config.rope_scaling or {}
        if not scaling.get('mrope_section'):
            # partial rotary: sections must tile rope_dim/2, not head_dim/2
            half = config.rope_dim // 2
            self.mrope_section = (half - 2 * (half // 3),
                                  half // 3, half // 3)
        # qwen3_5 inherits qwen3-vl's lane-interleaved mrope convention
        self.mrope_interleaved = bool(scaling.get('mrope_interleaved', True))

    def _gather_rope(self, rope_cos, rope_sin, positions):
        from ..nn.layers import gather_mrope
        if positions.ndim == 3:
            return gather_mrope(rope_cos, rope_sin, positions,
                                self.mrope_section,
                                interleaved=self.mrope_interleaved)
        return Qwen3NextModel._gather_rope(self, rope_cos, rope_sin,
                                           positions)

    # engine-facing helpers delegate to the qwen-vl machinery
    def vis_param_shapes(self):
        return self.tower.param_shapes()

    def init_vis_params(self, dtype=None):
        import jax.numpy as jnp
        return self.tower.init_params(dtype=dtype or jnp.float32)

    def vis_assign_plan(self):
        plan = self.tower.make_assign_plan('visual.')
        plan.update({'model.' + k: v for k, v in list(plan.items())})
        return plan

    def encode_images_raw(self, vis_params, images):
        from .qwen3_vl import _Qwen3VLMixin
        return _Qwen3VLMixin.encode_images_raw(self, vis_params, images)

    def build_mrope(self, token_ids, grids, start: int = 0):
        from .qwen2_vl import mrope_positions
        return mrope_positions(token_ids, self.image_token_index, grids,
                               merge=self.tower.merge, start=start)


# uses_mrope marks the VLM surface for the engine's position plumbing
_Qwen3_5VLMixin.uses_mrope = True


def build_qwen3_5(config: ModelConfig):
    """Dense or MoE Qwen3.5; wraps the vision tower when the config nests
    a ``vision_config`` (it always does for real checkpoints)."""
    if config.vision:
        cls = type('Qwen3_5VLModel', (_Qwen3_5VLMixin, Qwen3_5TextModel), {})
        model = cls(config)
        model._init_vision(config)
        return model
    return Qwen3_5TextModel(config)
