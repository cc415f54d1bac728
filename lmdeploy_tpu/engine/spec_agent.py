"""Draft-model speculative decoding: propose k tokens, verify in one target pass.

Reference analog: ``lmdeploy/pytorch/spec_decode/`` (SpecModelAgent ``spec_agent.py:149``
runs the draft inside the main agent step; batched rejection sampler).

TPU design: one jitted spec step does (a) k draft autoregressive steps via
``lax.scan`` over the draft model, (b) one target forward over the [last, d1..dk]
chunk with all-position logits, (c) batched rejection sampling
(ops/spec_sampling.py), (d) in-place state update advancing each row by its
accepted count.  Rejected positions leave stale KV past ``num_computed`` in both
caches — never read (attention masks by length) and overwritten when the real
tokens reach those positions.  Draft staleness (the resampled token's KV is never
computed by the draft) only lowers acceptance, never correctness — rejection
sampling guarantees the target distribution for ANY draft.

Sampling parity: target/draft distributions use the same per-row
temperature/top-k/top-p/min-p masking as normal decoding; greedy rows use one-hot
distributions (speculation degenerates to exact-match verification).  Penalty
counts are frozen at the step start across the k positions (documented
approximation, as in the reference's processor restrictions).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

from ..config import ModelConfig
from ..models import build_model
from ..models.llama import AttnMeta
from ..nn.layers import make_rope_table
from ..ops.sampling import SamplingInputs, _top_k_p_min_p_mask, apply_penalties
from ..ops.spec_sampling import reject_sample


class SpecExtension:
    """Attaches a draft model + caches + the jitted spec step to a ModelAgent."""

    def __init__(self, agent, draft_model_path: str, num_speculative_tokens: int = 4,
                 draft_empty_init: bool = False, method: str = 'draft_model'):
        import jax
        import jax.numpy as jnp

        self.agent = agent
        self.k = num_speculative_tokens
        self.method = method
        if method == 'deepseek_mtp':
            # the MTP module's weights live IN the target checkpoint
            # (model.layers.{num_layers}.*) and share its embed/lm_head
            self.draft_config = agent.model_config
            from ..models.deepseek import DeepseekMTP
            from ..models.glm4_moe import Glm4MoeModel, Glm4MoeMTP
            from ..models.glm_moe_dsa import GlmMoeDsaModel, GlmMoeDsaMTP
            if isinstance(agent.model, GlmMoeDsaModel):
                # GLM-5.2 MTP layer: DSA attention (own lightning indexer)
                self.draft_model = GlmMoeDsaMTP(self.draft_config)
            elif isinstance(agent.model, Glm4MoeModel):
                # GLM-4.5/4.6 nextn layer: same skeleton, GQA attention
                self.draft_model = Glm4MoeMTP(self.draft_config)
            else:
                self.draft_model = DeepseekMTP(self.draft_config)
            self.hidden = jnp.zeros(
                (agent.max_batch, agent.model_config.hidden_size),
                agent.model_config.jnp_dtype())
        elif method == 'qwen3_5_mtp':
            # Qwen3.5 MTP layer (weights under the target's 'mtp.' prefix);
            # the TARGET is hybrid linear-attention, so verification rolls
            # its conv/recurrent state back to the last accepted position
            # via per-position snapshots (_get_fn_mtp_hybrid)
            self.draft_config = agent.model_config
            from ..models.qwen3_5 import Qwen3_5MTP
            self.draft_model = Qwen3_5MTP(self.draft_config)
            self.hidden = jnp.zeros(
                (agent.max_batch, agent.model_config.hidden_size),
                agent.model_config.jnp_dtype())
        elif method == 'eagle3':
            self.draft_config = ModelConfig.from_pretrained(
                draft_model_path, dtype=agent.model_config.dtype)
            from ..models.eagle import Eagle3Head
            self.draft_model = Eagle3Head(self.draft_config)
            # aux taps on the target: reference configurations/llama.py picks
            # layer-INPUT indices (2, L//2, L-3); our scan captures layer
            # OUTPUTS, so shift by one (clipped for tiny test models)
            L = agent.model_config.num_layers
            if getattr(agent.model, 'aux_hidden_layers', None) is None:
                agent.model.aux_hidden_layers = (
                    max(0, min(1, L - 1)),
                    max(0, min(L // 2 - 1, L - 1)),
                    max(0, min(L - 4, L - 1)))
            th = self.draft_model.target_hidden
            self.hidden = jnp.zeros((agent.max_batch, 3 * th),
                                    agent.model_config.jnp_dtype())
        elif method == 'eagle':
            self.draft_config = ModelConfig.from_pretrained(
                draft_model_path, dtype=agent.model_config.dtype)
            from ..models.eagle import EagleHead
            self.draft_model = EagleHead(self.draft_config)
            # feature buffer: last accepted pre-norm target feature per row.
            # Fresh rows start at zero — that only lowers the first step's
            # acceptance rate; rejection sampling keeps outputs exact.
            self.hidden = jnp.zeros(
                (agent.max_batch, agent.model_config.hidden_size),
                agent.model_config.jnp_dtype())
        else:
            self.draft_config = ModelConfig.from_pretrained(
                draft_model_path, dtype=agent.model_config.dtype)
            self.draft_model = build_model(self.draft_config)
        if draft_empty_init:
            self.draft_params = self.draft_model.init_params(jax.random.PRNGKey(1))
        else:
            from ..weight_loader import load_model_params
            self.draft_params = load_model_params(self.draft_model, draft_model_path)
        dc = self.draft_config
        from ..ops.attention import kv_row_width
        # cache_head_dim covers MLA drafts (latent+rope vector, 1 kv head)
        _, rowp = kv_row_width(dc.num_key_value_heads, dc.cache_head_dim)
        n_draft_layers = 1 if method in ('eagle', 'eagle3', 'deepseek_mtp',
                                         'qwen3_5_mtp') \
            else dc.num_layers
        shape = (n_draft_layers, agent.num_blocks, 2,
                 agent.cache_config.block_size, rowp)
        target_kc = agent.cache_engine.kv_cache
        if isinstance(target_kc, dict):     # hybrid target: pages + states
            target_kc = target_kc['pages']
        dtype = target_kc.dtype
        if dtype in (jnp.int8, jnp.uint8):   # quantized target: draft unquantized
            dtype = agent.model_config.jnp_dtype()
        self.draft_kv = jnp.zeros(shape, dtype)
        cos, sin = make_rope_table(dc.rope_dim, agent.max_model_len, dc.rope_theta,
                                   dc.rope_scaling)
        self.draft_cos = jax.device_put(cos)
        self.draft_sin = jax.device_put(sin)
        self._fns = {}

    # -- jitted spec step ---------------------------------------------------------------
    @staticmethod
    def _masked_dist(logits, st, counts, pmask=None, greedy_onehot=True):
        """Per-row sampling distribution matching ops/sampling semantics."""
        import jax
        import jax.numpy as jnp
        si = SamplingInputs(
            temperature=st['temperature'], top_k=st['top_k'], top_p=st['top_p'],
            min_p=st['min_p'], repetition_penalty=st['repetition_penalty'],
            frequency_penalty=st['frequency_penalty'],
            presence_penalty=st['presence_penalty'], do_sample=st['do_sample'],
            seeds=st['seed'])
        logits = apply_penalties(logits.astype(jnp.float32), counts, si, pmask)
        scaled = logits / si.temperature[:, None]
        keep = _top_k_p_min_p_mask(scaled, si)
        masked = jnp.where(keep, scaled, -jnp.inf)
        dist = jax.nn.softmax(masked, axis=-1)
        if greedy_onehot:
            onehot = jax.nn.one_hot(jnp.argmax(logits, -1), logits.shape[-1],
                                    dtype=jnp.float32)
            dist = jnp.where(si.do_sample[:, None], dist, onehot)
        return dist

    def _get_fn(self, B: int):
        import jax
        import jax.numpy as jnp

        fn = self._fns.get(B)
        if fn is not None:
            return fn
        agent = self.agent
        target = agent.model
        draft = self.draft_model
        K = self.k
        GOLDEN = np.uint32(0x9E3779B9)
        from .decode_state import DecodeState
        row_fields = [f.name for f in dataclasses.fields(DecodeState)
                      if f.name not in ('token_counts', 'prompt_mask')]

        masked_dist = self._masked_dist

        def run(params, dparams, rope_cos, rope_sin, dcos, dsin,
                kc, dkc, state):
            sub = {n: getattr(state, n)[:B] for n in row_fields}
            counts = state.token_counts[:B]
            pmask = state.prompt_mask[:B]
            act = sub['active']
            q1 = act.astype(jnp.int32)

            # (a) draft proposes K tokens
            def draft_step(carry, i):
                dkc, tok, dpos = carry
                meta = AttnMeta(block_tables=sub['tables'], history_lens=dpos,
                                q_lens=q1)
                logits, dkc = draft.forward(
                    dparams, tok[:, None],
                    jnp.clip(dpos, 0, agent.max_model_len - 1)[:, None],
                    dkc, meta, dcos, dsin)
                dist = masked_dist(logits, sub, counts, pmask)
                seeds = sub['seed'] + (sub['step_no'].astype(jnp.uint32)
                                       + 1 + i.astype(jnp.uint32)) * GOLDEN
                toks = jax.vmap(lambda s, p: jax.random.choice(
                    jax.random.key(s), logits.shape[-1], p=p))(seeds, dist)
                toks = toks.astype(jnp.int32)
                return (dkc, toks, dpos + q1), (toks, dist)

            (dkc, _, _), (draft_toks, draft_dists) = jax.lax.scan(
                draft_step, (dkc, sub['token'], sub['position']),
                jnp.arange(K))
            draft_toks = jnp.swapaxes(draft_toks, 0, 1)       # [B, K]
            draft_dists = jnp.swapaxes(draft_dists, 0, 1)     # [B, K, V]

            # (b) target verifies the whole chunk at once
            chunk = jnp.concatenate([sub['token'][:, None], draft_toks], axis=1)
            positions = sub['position'][:, None] + \
                jnp.arange(K + 1, dtype=jnp.int32)[None, :]
            meta = AttnMeta(block_tables=sub['tables'],
                            history_lens=sub['position'],
                            q_lens=q1 * (K + 1))
            logits_all, kc = target.forward(
                params, chunk, jnp.clip(positions, 0, agent.max_model_len - 1),
                kc, meta, rope_cos, rope_sin, return_all_logits=True)
            tgt_dists = jax.vmap(
                lambda lg: masked_dist(lg, sub, counts, pmask),
                in_axes=1, out_axes=1)(logits_all)            # [B, K+1, V]

            # (c) accept / resample
            # per-row verify stream (distinct mixer from the draft stream)
            row_keys = jax.vmap(jax.random.key)(
                sub['seed'] + sub['step_no'].astype(jnp.uint32)
                * np.uint32(0x85EBCA6B))
            out_toks, n_emitted = reject_sample(tgt_dists, draft_dists, draft_toks,
                                                row_keys)
            n_emitted = jnp.where(act, n_emitted, 0)
            lp_all = jax.nn.log_softmax(logits_all.astype(jnp.float32), axis=-1)
            out_lps = jnp.take_along_axis(lp_all, out_toks[..., None],
                                          axis=-1)[..., 0]          # [B, K+1]

            # (d) state update: advance by the accepted count
            last_idx = jnp.clip(n_emitted - 1, 0, K)
            new_token = jnp.take_along_axis(out_toks, last_idx[:, None],
                                            axis=1)[:, 0]
            new_token = jnp.where(act, new_token, sub['token'])
            counts_upd = state.token_counts
            emit_mask = (jnp.arange(K + 1, dtype=jnp.int32)[None, :]
                         < n_emitted[:, None])
            rows = jnp.broadcast_to(jnp.arange(B)[:, None], (B, K + 1))
            counts_upd = counts_upd.at[rows.reshape(-1),
                                       out_toks.reshape(-1)].add(
                emit_mask.reshape(-1).astype(counts_upd.dtype))
            sub = dict(sub, token=new_token,
                       position=sub['position'] + n_emitted,
                       step_no=sub['step_no'] + n_emitted)
            state = dataclasses.replace(
                state, token_counts=counts_upd,
                **{n: getattr(state, n).at[:B].set(sub[n]) for n in row_fields})
            return kc, dkc, state, out_toks, n_emitted, out_lps

        fn = jax.jit(run, donate_argnums=(6, 7, 8))
        self._fns[B] = fn
        return fn

    def _get_fn_eagle(self, B: int):
        """EAGLE spec step: feature-conditioned 1-layer head instead of a full
        draft model.  Same accept/resample machinery; additionally threads the
        per-row conditioning feature — initialized from the previous verify's
        pre-norm hidden at the last accepted position."""
        import jax
        import jax.numpy as jnp

        key = ('eagle', B)
        fn = self._fns.get(key)
        if fn is not None:
            return fn
        agent = self.agent
        target = agent.model
        eagle = self.draft_model
        K = self.k
        GOLDEN = np.uint32(0x9E3779B9)
        from .decode_state import DecodeState
        row_fields = [f.name for f in dataclasses.fields(DecodeState)
                      if f.name not in ('token_counts', 'prompt_mask')]
        masked_dist = self._masked_dist

        def run(params, dparams, rope_cos, rope_sin, kc, dkc, state,
                hidden_full):
            sub = {n: getattr(state, n)[:B] for n in row_fields}
            counts = state.token_counts[:B]
            pmask = state.prompt_mask[:B]
            act = sub['active']
            q1 = act.astype(jnp.int32)

            def draft_step(carry, i):
                dkc, tok, dpos, h_cond = carry
                logits, h_new, dkc = eagle.step(
                    dparams, params, h_cond, tok,
                    jnp.clip(dpos, 0, agent.max_model_len - 1),
                    dkc, sub['tables'], q1, rope_cos, rope_sin,
                    agent.max_model_len)
                dist = masked_dist(logits, sub, counts, pmask)
                seeds = sub['seed'] + (sub['step_no'].astype(jnp.uint32)
                                       + 1 + i.astype(jnp.uint32)) * GOLDEN
                toks = jax.vmap(lambda s, p: jax.random.choice(
                    jax.random.key(s), logits.shape[-1], p=p))(seeds, dist)
                toks = toks.astype(jnp.int32)
                return (dkc, toks, dpos + q1, h_new), (toks, dist)

            (dkc, _, _, _), (draft_toks, draft_dists) = jax.lax.scan(
                draft_step,
                (dkc, sub['token'], sub['position'], hidden_full[:B]),
                jnp.arange(K))
            draft_toks = jnp.swapaxes(draft_toks, 0, 1)
            draft_dists = jnp.swapaxes(draft_dists, 0, 1)

            chunk = jnp.concatenate([sub['token'][:, None], draft_toks], axis=1)
            positions = sub['position'][:, None] + \
                jnp.arange(K + 1, dtype=jnp.int32)[None, :]
            meta = AttnMeta(block_tables=sub['tables'],
                            history_lens=sub['position'],
                            q_lens=q1 * (K + 1))
            logits_all, kc, hidden_all = target.forward(
                params, chunk, jnp.clip(positions, 0, agent.max_model_len - 1),
                kc, meta, rope_cos, rope_sin, return_all_logits=True,
                return_hidden=True)
            tgt_dists = jax.vmap(
                lambda lg: masked_dist(lg, sub, counts, pmask),
                in_axes=1, out_axes=1)(logits_all)

            row_keys = jax.vmap(jax.random.key)(
                sub['seed'] + sub['step_no'].astype(jnp.uint32)
                * np.uint32(0x85EBCA6B))
            out_toks, n_emitted = reject_sample(tgt_dists, draft_dists,
                                                draft_toks, row_keys)
            n_emitted = jnp.where(act, n_emitted, 0)
            lp_all = jax.nn.log_softmax(logits_all.astype(jnp.float32), axis=-1)
            out_lps = jnp.take_along_axis(lp_all, out_toks[..., None],
                                          axis=-1)[..., 0]          # [B, K+1]

            last_idx = jnp.clip(n_emitted - 1, 0, K)
            new_token = jnp.take_along_axis(out_toks, last_idx[:, None],
                                            axis=1)[:, 0]
            new_token = jnp.where(act, new_token, sub['token'])
            # conditioning feature for the NEXT round: target hidden at the
            # last position whose NEXT token is known = accepted count - 1
            new_h = jnp.take_along_axis(
                hidden_all, last_idx[:, None, None], axis=1)[:, 0]
            hidden_full = hidden_full.at[:B].set(
                jnp.where(act[:, None], new_h, hidden_full[:B]))
            counts_upd = state.token_counts
            emit_mask = (jnp.arange(K + 1, dtype=jnp.int32)[None, :]
                         < n_emitted[:, None])
            rows = jnp.broadcast_to(jnp.arange(B)[:, None], (B, K + 1))
            counts_upd = counts_upd.at[rows.reshape(-1),
                                       out_toks.reshape(-1)].add(
                emit_mask.reshape(-1).astype(counts_upd.dtype))
            sub = dict(sub, token=new_token,
                       position=sub['position'] + n_emitted,
                       step_no=sub['step_no'] + n_emitted)
            state = dataclasses.replace(
                state, token_counts=counts_upd,
                **{n: getattr(state, n).at[:B].set(sub[n]) for n in row_fields})
            return kc, dkc, state, hidden_full, out_toks, n_emitted, out_lps

        fn = jax.jit(run, donate_argnums=(4, 5, 6, 7))
        self._fns[key] = fn
        return fn

    def _get_fn_mtp_hybrid(self, B: int):
        """MTP spec step for HYBRID linear-attention targets (qwen3_5).

        Identical accept/resample machinery to ``_get_fn_eagle``, plus state
        rollback: the verify forward advances the target's conv/recurrent
        state through all K+1 chunk positions, so it also emits per-position
        snapshots; after rejection sampling the state is reset to the
        snapshot at the last accepted position (paged KV needs no rollback —
        stale rows past ``position`` are masked by length and overwritten).
        Reference analog: 1+num_spec_tokens state copies in
        ``configurations/qwen3_5.py`` recurrent_state_shape."""
        import jax
        import jax.numpy as jnp

        key = ('mtp_hybrid', B)
        fn = self._fns.get(key)
        if fn is not None:
            return fn
        agent = self.agent
        target = agent.model
        mtp = self.draft_model
        K = self.k
        GOLDEN = np.uint32(0x9E3779B9)
        from .decode_state import DecodeState
        row_fields = [f.name for f in dataclasses.fields(DecodeState)
                      if f.name not in ('token_counts', 'prompt_mask')]
        masked_dist = self._masked_dist

        def run(params, dparams, rope_cos, rope_sin, kc, dkc, state,
                hidden_full):
            sub = {n: getattr(state, n)[:B] for n in row_fields}
            counts = state.token_counts[:B]
            pmask = state.prompt_mask[:B]
            act = sub['active']
            q1 = act.astype(jnp.int32)

            def draft_step(carry, i):
                dkc, tok, dpos, h_cond = carry
                logits, h_new, dkc = mtp.step(
                    dparams, params, h_cond, tok,
                    jnp.clip(dpos, 0, agent.max_model_len - 1),
                    dkc, sub['tables'], q1, rope_cos, rope_sin,
                    agent.max_model_len)
                dist = masked_dist(logits, sub, counts, pmask)
                seeds = sub['seed'] + (sub['step_no'].astype(jnp.uint32)
                                       + 1 + i.astype(jnp.uint32)) * GOLDEN
                toks = jax.vmap(lambda s, p: jax.random.choice(
                    jax.random.key(s), logits.shape[-1], p=p))(seeds, dist)
                toks = toks.astype(jnp.int32)
                return (dkc, toks, dpos + q1, h_new), (toks, dist)

            (dkc, _, _, _), (draft_toks, draft_dists) = jax.lax.scan(
                draft_step,
                (dkc, sub['token'], sub['position'], hidden_full[:B]),
                jnp.arange(K))
            draft_toks = jnp.swapaxes(draft_toks, 0, 1)
            draft_dists = jnp.swapaxes(draft_dists, 0, 1)

            chunk = jnp.concatenate([sub['token'][:, None], draft_toks],
                                    axis=1)
            positions = sub['position'][:, None] + \
                jnp.arange(K + 1, dtype=jnp.int32)[None, :]
            meta = AttnMeta(block_tables=sub['tables'],
                            history_lens=sub['position'],
                            q_lens=q1 * (K + 1))
            logits_all, kc, hidden_all, snaps = target.forward(
                params, chunk, jnp.clip(positions, 0, agent.max_model_len - 1),
                kc, meta, rope_cos, rope_sin, return_all_logits=True,
                return_hidden=True, return_state_snapshots=True)
            tgt_dists = jax.vmap(
                lambda lg: masked_dist(lg, sub, counts, pmask),
                in_axes=1, out_axes=1)(logits_all)

            row_keys = jax.vmap(jax.random.key)(
                sub['seed'] + sub['step_no'].astype(jnp.uint32)
                * np.uint32(0x85EBCA6B))
            out_toks, n_emitted = reject_sample(tgt_dists, draft_dists,
                                                draft_toks, row_keys)
            n_emitted = jnp.where(act, n_emitted, 0)
            lp_all = jax.nn.log_softmax(logits_all.astype(jnp.float32),
                                        axis=-1)
            out_lps = jnp.take_along_axis(lp_all, out_toks[..., None],
                                          axis=-1)[..., 0]          # [B, K+1]

            last_idx = jnp.clip(n_emitted - 1, 0, K)
            # roll conv/recurrent state back to the last accepted position
            rows = jnp.arange(B)
            rec_sel = snaps['rec'][:, rows, last_idx]   # [n_lin,B,hv,dk,dv]
            conv_sel = snaps['conv'][:, rows, last_idx]  # [n_lin,B,K-1,C]
            rec_new = jnp.where(act[None, :, None, None, None],
                                rec_sel.astype(kc['rec'].dtype),
                                kc['rec'][:, :B])
            conv_new = jnp.where(act[None, :, None, None],
                                 conv_sel.astype(kc['conv'].dtype),
                                 kc['conv'][:, :B])
            kc = dict(kc, rec=kc['rec'].at[:, :B].set(rec_new),
                      conv=kc['conv'].at[:, :B].set(conv_new))

            new_token = jnp.take_along_axis(out_toks, last_idx[:, None],
                                            axis=1)[:, 0]
            new_token = jnp.where(act, new_token, sub['token'])
            new_h = jnp.take_along_axis(
                hidden_all, last_idx[:, None, None], axis=1)[:, 0]
            hidden_full = hidden_full.at[:B].set(
                jnp.where(act[:, None], new_h, hidden_full[:B]))
            counts_upd = state.token_counts
            emit_mask = (jnp.arange(K + 1, dtype=jnp.int32)[None, :]
                         < n_emitted[:, None])
            rows2 = jnp.broadcast_to(jnp.arange(B)[:, None], (B, K + 1))
            counts_upd = counts_upd.at[rows2.reshape(-1),
                                       out_toks.reshape(-1)].add(
                emit_mask.reshape(-1).astype(counts_upd.dtype))
            sub = dict(sub, token=new_token,
                       position=sub['position'] + n_emitted,
                       step_no=sub['step_no'] + n_emitted)
            state = dataclasses.replace(
                state, token_counts=counts_upd,
                **{n: getattr(state, n).at[:B].set(sub[n])
                   for n in row_fields})
            return kc, dkc, state, hidden_full, out_toks, n_emitted, out_lps

        fn = jax.jit(run, donate_argnums=(4, 5, 6, 7))
        self._fns[key] = fn
        return fn

    def _get_fn_eagle3(self, B: int):
        """EAGLE-3 spec step.  Differences from _get_fn_eagle: the first
        draft conditioning is ``fc`` of the TARGET's concatenated aux hidden
        states (3 intermediate layers, captured by the verify forward);
        later draft steps chain on the head's own pre-norm output; draft
        logits live in a reduced draft vocab and are scattered through
        ``d2t`` into target-vocab space before masking/acceptance."""
        import jax
        import jax.numpy as jnp

        key = ('eagle3', B)
        fn = self._fns.get(key)
        if fn is not None:
            return fn
        agent = self.agent
        target = agent.model
        eagle = self.draft_model
        K = self.k
        V = agent.model_config.vocab_size
        GOLDEN = np.uint32(0x9E3779B9)
        from .decode_state import DecodeState
        row_fields = [f.name for f in dataclasses.fields(DecodeState)
                      if f.name not in ('token_counts', 'prompt_mask')]
        masked_dist = self._masked_dist
        use_own_embed = eagle.saw_embed
        NEG = jnp.float32(-1e30)

        def run(params, dparams, rope_cos, rope_sin, kc, dkc, state,
                hidden_full):
            sub = {n: getattr(state, n)[:B] for n in row_fields}
            counts = state.token_counts[:B]
            pmask = state.prompt_mask[:B]
            act = sub['active']
            q1 = act.astype(jnp.int32)
            emb_table = dparams['embed'] if use_own_embed else params['embed']
            d2t = dparams['d2t']

            h0 = (hidden_full[:B].astype(jnp.float32)
                  @ dparams['fc'].astype(jnp.float32)
                  ).astype(emb_table.dtype)                     # [B, H_draft]

            def draft_step(carry, i):
                dkc, tok, dpos, h_cond = carry
                dlogits, h_new, dkc = eagle.step(
                    dparams, emb_table, h_cond, tok,
                    jnp.clip(dpos, 0, agent.max_model_len - 1),
                    dkc, sub['tables'], q1, rope_cos, rope_sin,
                    agent.max_model_len)
                # draft vocab -> target vocab (unmapped ids unreachable)
                logits = jnp.full((B, V), NEG, jnp.float32)
                logits = logits.at[:, d2t].set(dlogits)
                dist = masked_dist(logits, sub, counts, pmask)
                seeds = sub['seed'] + (sub['step_no'].astype(jnp.uint32)
                                       + 1 + i.astype(jnp.uint32)) * GOLDEN
                toks = jax.vmap(lambda s, p: jax.random.choice(
                    jax.random.key(s), V, p=p))(seeds, dist)
                toks = toks.astype(jnp.int32)
                return (dkc, toks, dpos + q1, h_new), (toks, dist)

            (dkc, _, _, _), (draft_toks, draft_dists) = jax.lax.scan(
                draft_step,
                (dkc, sub['token'], sub['position'], h0),
                jnp.arange(K))
            draft_toks = jnp.swapaxes(draft_toks, 0, 1)
            draft_dists = jnp.swapaxes(draft_dists, 0, 1)

            chunk = jnp.concatenate([sub['token'][:, None], draft_toks], axis=1)
            positions = sub['position'][:, None] + \
                jnp.arange(K + 1, dtype=jnp.int32)[None, :]
            meta = AttnMeta(block_tables=sub['tables'],
                            history_lens=sub['position'],
                            q_lens=q1 * (K + 1))
            logits_all, kc, aux_all = target.forward(
                params, chunk, jnp.clip(positions, 0, agent.max_model_len - 1),
                kc, meta, rope_cos, rope_sin, return_all_logits=True,
                return_aux_hidden=True)
            tgt_dists = jax.vmap(
                lambda lg: masked_dist(lg, sub, counts, pmask),
                in_axes=1, out_axes=1)(logits_all)

            row_keys = jax.vmap(jax.random.key)(
                sub['seed'] + sub['step_no'].astype(jnp.uint32)
                * np.uint32(0x85EBCA6B))
            out_toks, n_emitted = reject_sample(tgt_dists, draft_dists,
                                                draft_toks, row_keys)
            n_emitted = jnp.where(act, n_emitted, 0)
            lp_all = jax.nn.log_softmax(logits_all.astype(jnp.float32), axis=-1)
            out_lps = jnp.take_along_axis(lp_all, out_toks[..., None],
                                          axis=-1)[..., 0]          # [B, K+1]

            last_idx = jnp.clip(n_emitted - 1, 0, K)
            new_token = jnp.take_along_axis(out_toks, last_idx[:, None],
                                            axis=1)[:, 0]
            new_token = jnp.where(act, new_token, sub['token'])
            new_h = jnp.take_along_axis(
                aux_all, last_idx[:, None, None], axis=1)[:, 0]   # [B, 3H]
            hidden_full = hidden_full.at[:B].set(
                jnp.where(act[:, None], new_h, hidden_full[:B]))
            counts_upd = state.token_counts
            emit_mask = (jnp.arange(K + 1, dtype=jnp.int32)[None, :]
                         < n_emitted[:, None])
            rows = jnp.broadcast_to(jnp.arange(B)[:, None], (B, K + 1))
            counts_upd = counts_upd.at[rows.reshape(-1),
                                       out_toks.reshape(-1)].add(
                emit_mask.reshape(-1).astype(counts_upd.dtype))
            sub = dict(sub, token=new_token,
                       position=sub['position'] + n_emitted,
                       step_no=sub['step_no'] + n_emitted)
            state = dataclasses.replace(
                state, token_counts=counts_upd,
                **{n: getattr(state, n).at[:B].set(sub[n]) for n in row_fields})
            return kc, dkc, state, hidden_full, out_toks, n_emitted, out_lps

        fn = jax.jit(run, donate_argnums=(4, 5, 6, 7))
        self._fns[key] = fn
        return fn

    def spec_decode(self, num_rows: int) -> Tuple[np.ndarray, np.ndarray]:
        """Run one speculative step over rows [0, num_rows).

        Returns (out_tokens [B, K+1], num_emitted [B]) as numpy.  Caller must have
        ensured block capacity for K+1 new tokens per row.
        """
        from ..config import bucketize
        agent = self.agent
        B = bucketize(num_rows, agent.batch_buckets)
        if self.method == 'qwen3_5_mtp':
            fn = self._get_fn_mtp_hybrid(B)
            (kc, self.draft_kv, agent.decode_state,
             self.hidden, out_toks, n_emitted, out_lps) = fn(
                agent.params, self.draft_params, agent.rope_cos,
                agent.rope_sin, agent.cache_engine.kv_cache,
                self.draft_kv, agent.decode_state, self.hidden)
        elif self.method == 'eagle3':
            fn = self._get_fn_eagle3(B)
            (kc, self.draft_kv, agent.decode_state,
             self.hidden, out_toks, n_emitted, out_lps) = fn(
                agent.params, self.draft_params, agent.rope_cos, agent.rope_sin,
                agent.cache_engine.kv_cache,
                self.draft_kv, agent.decode_state, self.hidden)
        elif self.method in ('eagle', 'deepseek_mtp'):
            fn = self._get_fn_eagle(B)
            (kc, self.draft_kv, agent.decode_state,
             self.hidden, out_toks, n_emitted, out_lps) = fn(
                agent.params, self.draft_params, agent.rope_cos, agent.rope_sin,
                agent.cache_engine.kv_cache,
                self.draft_kv, agent.decode_state, self.hidden)
        else:
            fn = self._get_fn(B)
            (kc, self.draft_kv, agent.decode_state, out_toks,
             n_emitted, out_lps) = fn(
                agent.params, self.draft_params, agent.rope_cos, agent.rope_sin,
                self.draft_cos, self.draft_sin,
                agent.cache_engine.kv_cache,
                self.draft_kv, agent.decode_state)
        agent.cache_engine.swap_caches(kc)
        agent.token_counts = agent.decode_state.token_counts
        agent.prompt_mask = agent.decode_state.prompt_mask
        return np.asarray(out_toks), np.asarray(n_emitted), np.asarray(out_lps)
