"""DeepSeek-V4 (NSA sparse attention): engine vs a straight-line reference.

No transformers implementation exists for deepseek_v4, so the golden twin is
a test-local full-sequence numpy transcription of the architecture (from the
reference kernels' documented math: v4_compressor.py window/overlap pooling,
backends/cuda/attention/v4.py window+compressed+sink combined softmax,
hc_split_sinkhorn.py hyper-connections, deepseek_v4.py Gate/Expert).  The
reference recomputes everything from the full token sequence each step — no
rings, no paging, no caches — so agreement validates the engine's ring
states, paged window attention, compressed buffers, and indexer end to end.
"""
import asyncio
import json
import os

import numpy as np
import pytest

V = 64
H = 48
L = 4
NH = 4
D = 32
RD = 8
QR = 24
OG = 2
OR = 16
W = 8
RATIOS = [0, 4, 8, 4]
NHASH = 2
E, TOPK = 4, 2
MI = 32
HC = 2
HC_ITERS = 5
HC_EPS = 1e-6
IH, ID, ITOPK = 2, 16, 3
EPS = 1e-6
SWIGLU_LIMIT = 7.0
ROUTE_SCALE = 1.5
SCORE_FUNC = 'sigmoid'
MIX = (2 + HC) * HC

CFG = {
    'architectures': ['DeepseekV4ForCausalLM'],
    'model_type': 'deepseek_v4',
    'hidden_size': H, 'num_hidden_layers': L,
    'num_attention_heads': NH, 'num_key_value_heads': 1,
    'head_dim': D, 'qk_rope_head_dim': RD, 'q_lora_rank': QR,
    'o_groups': OG, 'o_lora_rank': OR,
    'sliding_window': W, 'compress_ratios': RATIOS,
    'compress_rope_theta': 1000.0,
    'num_hash_layers': NHASH,
    'n_routed_experts': E, 'num_experts_per_tok': TOPK,
    'moe_intermediate_size': MI, 'n_shared_experts': 1,
    'intermediate_size': MI,
    'scoring_func': SCORE_FUNC, 'routed_scaling_factor': ROUTE_SCALE,
    'swiglu_limit': SWIGLU_LIMIT, 'topk_method': 'noaux_tc',
    'hc_mult': HC, 'hc_sinkhorn_iters': HC_ITERS, 'hc_eps': HC_EPS,
    'index_n_heads': IH, 'index_head_dim': ID, 'index_topk': ITOPK,
    'rms_norm_eps': EPS, 'vocab_size': V,
    'rope_theta': 10000.0,
    'rope_scaling': {'rope_type': 'yarn', 'factor': 2.0,
                     'original_max_position_embeddings': 64,
                     'beta_fast': 8, 'beta_slow': 1},
    'max_position_embeddings': 128,
    'torch_dtype': 'float32',
    'bos_token_id': 1, 'eos_token_id': 2,
    'tie_word_embeddings': False,
}


def _make_weights(seed=0):
    rng = np.random.RandomState(seed)

    def r(*shape, s=0.08):
        return (rng.randn(*shape) * s).astype(np.float32)

    t = {
        'embed.weight': r(V, H, s=0.3),
        'norm.weight': 1.0 + r(H, s=0.05),
        'head.weight': r(V, H, s=0.3),
        'hc_head_fn': r(HC, HC * H, s=0.2),
        'hc_head_base': r(HC, s=0.3),
        'hc_head_scale': r(1, s=0.3),
    }
    for l in range(L):
        p = f'layers.{l}.'
        a = p + 'attn.'
        t[a + 'wq_a.weight'] = r(QR, H)
        t[a + 'q_norm.weight'] = 1.0 + r(QR, s=0.05)
        t[a + 'wq_b.weight'] = r(NH * D, QR)
        t[a + 'wkv.weight'] = r(D, H)
        t[a + 'kv_norm.weight'] = 1.0 + r(D, s=0.05)
        t[a + 'wo_a.weight'] = r(OG * OR, NH * D // OG)
        t[a + 'wo_b.weight'] = r(H, OG * OR)
        t[a + 'attn_sink'] = r(NH, s=0.5)
        ratio = RATIOS[l]
        if ratio:
            coff = 2 if ratio == 4 else 1
            c = a + 'compressor.'
            t[c + 'ape'] = r(ratio, coff * D, s=0.3)
            t[c + 'wkv.weight'] = r(coff * D, H)
            t[c + 'wgate.weight'] = r(coff * D, H, s=0.3)
            t[c + 'norm.weight'] = 1.0 + r(D, s=0.05)
        if ratio == 4:
            i = a + 'indexer.'
            t[i + 'wq_b.weight'] = r(IH * ID, QR)
            t[i + 'weights_proj.weight'] = r(IH, H, s=0.3)
            ic = i + 'compressor.'
            t[ic + 'ape'] = r(4, 2 * ID, s=0.3)
            t[ic + 'wkv.weight'] = r(2 * ID, H)
            t[ic + 'wgate.weight'] = r(2 * ID, H, s=0.3)
            t[ic + 'norm.weight'] = 1.0 + r(ID, s=0.05)
        f = p + 'ffn.'
        t[f + 'gate.weight'] = r(E, H, s=0.3)
        if l < NHASH:
            t[f + 'gate.tid2eid'] = rng.randint(
                0, E, size=(V, TOPK)).astype(np.int32)
        else:
            t[f + 'gate.bias'] = r(E, s=0.3)
        for e in range(E):
            q = f + f'experts.{e}.'
            t[q + 'w1.weight'] = r(MI, H)
            t[q + 'w3.weight'] = r(MI, H)
            t[q + 'w2.weight'] = r(H, MI)
        s_ = f + 'shared_experts.'
        t[s_ + 'w1.weight'] = r(MI, H)
        t[s_ + 'w3.weight'] = r(MI, H)
        t[s_ + 'w2.weight'] = r(H, MI)
        t[p + 'attn_norm.weight'] = 1.0 + r(H, s=0.05)
        t[p + 'ffn_norm.weight'] = 1.0 + r(H, s=0.05)
        t[p + 'hc_attn_fn'] = r(MIX, HC * H, s=0.2)
        t[p + 'hc_ffn_fn'] = r(MIX, HC * H, s=0.2)
        t[p + 'hc_attn_base'] = r(MIX, s=0.3)
        t[p + 'hc_ffn_base'] = r(MIX, s=0.3)
        t[p + 'hc_attn_scale'] = r(3, s=0.3)
        t[p + 'hc_ffn_scale'] = r(3, s=0.3)
    return t


@pytest.fixture(scope='module')
def v4_dir(tmp_path_factory):
    from safetensors.numpy import save_file
    from conftest import make_tiny_tokenizer
    path = str(tmp_path_factory.mktemp('tiny_dsv4'))
    json.dump(CFG, open(os.path.join(path, 'config.json'), 'w'))
    save_file(_make_weights(), os.path.join(path, 'model.safetensors'))
    make_tiny_tokenizer(path, vocab_size=V)
    return path


# ---------------------------------------------------------------------------------------
# straight-line numpy reference
# ---------------------------------------------------------------------------------------
def _rms(x, w):
    x = x.astype(np.float64)
    return (x / np.sqrt((x * x).mean(-1, keepdims=True) + EPS) * w)


def _rms_scale(a, b):
    b = b.astype(np.float64)
    return a / np.sqrt((b * b).mean(-1, keepdims=True) + EPS)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _rope_cx(x, cos, sin):
    y = x.reshape(x.shape[:-1] + (x.shape[-1] // 2, 2)).copy()
    xl, xh = y[..., 0].copy(), y[..., 1].copy()
    y[..., 0] = xl * cos - xh * sin
    y[..., 1] = xh * cos + xl * sin
    return y.reshape(x.shape)


def _fwht(x):
    n = x.shape[-1]
    y = x.astype(np.float64).copy()
    h = 1
    while h < n:
        y = y.reshape(y.shape[:-1] + (n // (2 * h), 2, h))
        a, b = y[..., 0, :].copy(), y[..., 1, :].copy()
        y[..., 0, :], y[..., 1, :] = a + b, a - b
        y = y.reshape(y.shape[:-3] + (n,))
        h *= 2
    return y / np.sqrt(n)


def _tables():
    from lmdeploy_tpu.nn.layers import make_rope_table
    plain = make_rope_table(RD, 128, 10000.0)
    comp = make_rope_table(RD, 128, 1000.0,
                           {'rope_type': 'yarn', 'factor': 2.0,
                            'original_max_position_embeddings': 64,
                            'beta_fast': 8, 'beta_slow': 1, 'mscale': 0})
    return (np.asarray(plain[0], np.float64), np.asarray(plain[1],
                                                         np.float64)), \
        (np.asarray(comp[0], np.float64), np.asarray(comp[1], np.float64))


def _hc_pre(x, fn, scale, base):
    T = x.shape[0]
    xf = x.reshape(T, HC * H)
    mix = _rms_scale(xf @ fn.T, xf)
    pre = _sigmoid(mix[:, :HC] * scale[0] + base[:HC]) + HC_EPS
    post = 2.0 * _sigmoid(mix[:, HC:2 * HC] * scale[1] + base[HC:2 * HC])
    comb = (mix[:, 2 * HC:] * scale[2] + base[2 * HC:]).reshape(T, HC, HC)
    comb = comb - comb.max(-1, keepdims=True)
    comb = np.exp(comb)
    comb = comb / comb.sum(-1, keepdims=True) + HC_EPS
    comb = comb / (comb.sum(-2, keepdims=True) + HC_EPS)
    for _ in range(HC_ITERS - 1):
        comb = comb / (comb.sum(-1, keepdims=True) + HC_EPS)
        comb = comb / (comb.sum(-2, keepdims=True) + HC_EPS)
    y = (pre[..., None] * x).sum(1)
    return y, post, comb


def _compress_ref(x, wd, pfx, ratio, Dc, comp_tab):
    """All compressed rows for the full sequence: [n_rows, Dc]."""
    T = x.shape[0]
    coff = 2 if ratio == 4 else 1
    kvc = x @ wd[pfx + 'wkv.weight'].T.astype(np.float64)
    sc = (x @ wd[pfx + 'wgate.weight'].T.astype(np.float64)
          + wd[pfx + 'ape'][np.arange(T) % ratio])
    rows = []
    ccos, csin = comp_tab
    for n in range(1, T // ratio + 1):
        p = n * ratio - 1
        win = np.arange(p - coff * ratio + 1, p + 1)
        if coff == 2:
            kvw = np.concatenate([
                np.where((win[:ratio] >= 0)[:, None], kvc[np.maximum(
                    win[:ratio], 0)][:, :Dc], 0.0),
                kvc[win[ratio:]][:, Dc:]], axis=0)
            scw = np.concatenate([
                np.where((win[:ratio] >= 0)[:, None], sc[np.maximum(
                    win[:ratio], 0)][:, :Dc], -1e30),
                sc[win[ratio:]][:, Dc:]], axis=0)
        else:
            kvw = np.where((win >= 0)[:, None], kvc[np.maximum(win, 0)], 0.0)
            scw = np.where((win >= 0)[:, None], sc[np.maximum(win, 0)],
                           -1e30)
        w = np.exp(scw - scw.max(0, keepdims=True))
        w = w / w.sum(0, keepdims=True)
        pooled = (w * kvw).sum(0)
        pooled = _rms(pooled, wd[pfx + 'norm.weight'])
        cidx = max(p + 1 - ratio, 0)
        pooled[-RD:] = _rope_cx(pooled[-RD:], ccos[cidx], csin[cidx])
        rows.append(pooled)
    return np.stack(rows) if rows else np.zeros((0, Dc))


def ref_logits(wd, ids):
    """Full-sequence forward; returns last-position logits [V]."""
    plain_tab, comp_tab = _tables()
    T = len(ids)
    pos = np.arange(T)
    x = wd['embed.weight'][ids].astype(np.float64)
    x = np.repeat(x[:, None, :], HC, axis=1)                  # [T, HC, H]
    for l in range(L):
        p = f'layers.{l}.'
        a = p + 'attn.'
        ratio = RATIOS[l]
        tab = comp_tab if ratio else plain_tab
        y, post, comb = _hc_pre(x, wd[p + 'hc_attn_fn'],
                                wd[p + 'hc_attn_scale'],
                                wd[p + 'hc_attn_base'])
        h = _rms(y, wd[p + 'attn_norm.weight'])

        qr = _rms(h @ wd[a + 'wq_a.weight'].T.astype(np.float64),
                  wd[a + 'q_norm.weight'])
        q = (qr @ wd[a + 'wq_b.weight'].T.astype(np.float64)
             ).reshape(T, NH, D)
        q = _rms_scale(q, q)
        kv = _rms(h @ wd[a + 'wkv.weight'].T.astype(np.float64),
                  wd[a + 'kv_norm.weight'])
        cos, sin = tab[0][pos], tab[1][pos]
        q[..., -RD:] = _rope_cx(q[..., -RD:], cos[:, None], sin[:, None])
        kv[..., -RD:] = _rope_cx(kv[..., -RD:], cos, sin)

        comp = None
        icomp = None
        if ratio:
            comp = _compress_ref(h, wd, a + 'compressor.', ratio, D,
                                 comp_tab)
        if ratio == 4:
            icomp = _fwht(_compress_ref(h, wd, a + 'indexer.compressor.',
                                        4, ID, comp_tab))
            iq = (qr @ wd[a + 'indexer.wq_b.weight'].T.astype(np.float64)
                  ).reshape(T, IH, ID)
            iq[..., -RD:] = _rope_cx(iq[..., -RD:], cos[:, None],
                                     sin[:, None])
            iq = _fwht(iq)
            iw = (h @ wd[a + 'indexer.weights_proj.weight'].T.astype(
                np.float64)) * (ID ** -0.5 * IH ** -0.5)

        out = np.zeros((T, NH, D))
        sink = wd[a + 'attn_sink'].astype(np.float64)
        for t in range(T):
            lo = max(0, t - W + 1)
            keys = [kv[lo:t + 1]]
            if ratio:
                cnt = (t + 1) // ratio
                if ratio == 4 and cnt > 0:
                    score = (np.maximum(
                        np.einsum('hd,cd->hc', iq[t], icomp[:cnt]), 0.0)
                        * iw[t][:, None]).sum(0)
                    k = min(ITOPK, cnt)
                    # stable sort: relu scores tie at exactly 0.0 whenever
                    # all head dots are negative; lax.top_k breaks ties by
                    # lowest index, so the reference must too
                    sel = np.argsort(-score, kind='stable')[:k]
                    keys.append(comp[sel])
                elif cnt > 0:
                    keys.append(comp[:cnt])
            kk = np.concatenate(keys, axis=0)
            logit = q[t] @ kk.T * (D ** -0.5)                 # [NH, S]
            m = np.maximum(logit.max(-1), sink)
            e = np.exp(logit - m[:, None])
            denom = e.sum(-1) + np.exp(sink - m)
            out[t] = (e @ kk) / denom[:, None]
        out[..., -RD:] = _rope_cx(out[..., -RD:], cos[:, None],
                                  -sin[:, None])
        og = out.reshape(T, OG, (NH // OG) * D)
        wo_a = wd[a + 'wo_a.weight'].reshape(OG, OR, NH * D // OG)
        o = np.einsum('tgi,goi->tgo', og, wo_a.astype(np.float64))
        attn = o.reshape(T, OG * OR) @ wd[a + 'wo_b.weight'].T.astype(
            np.float64)
        x = (post[..., None] * attn[:, None, :]
             + np.einsum('tos,tsh->toh', comb, x))

        # ffn
        y, post, comb = _hc_pre(x, wd[p + 'hc_ffn_fn'],
                                wd[p + 'hc_ffn_scale'],
                                wd[p + 'hc_ffn_base'])
        h = _rms(y, wd[p + 'ffn_norm.weight'])
        f = p + 'ffn.'
        scores = _sigmoid(h @ wd[f + 'gate.weight'].T.astype(np.float64))
        if l < NHASH:
            idx = wd[f + 'gate.tid2eid'][ids]                 # [T, k]
        else:
            idx = np.argsort(-(scores + wd[f + 'gate.bias']), -1)[:, :TOPK]
        wts = np.take_along_axis(scores, idx, axis=-1)
        wts = wts / wts.sum(-1, keepdims=True) * ROUTE_SCALE

        def expert(prefix, z):
            g = z @ wd[prefix + 'w1.weight'].T.astype(np.float64)
            u = z @ wd[prefix + 'w3.weight'].T.astype(np.float64)
            u = np.clip(u, -SWIGLU_LIMIT, SWIGLU_LIMIT)
            g = np.minimum(g, SWIGLU_LIMIT)
            act = g * _sigmoid(g) * u
            return act @ wd[prefix + 'w2.weight'].T.astype(np.float64)

        ff = np.zeros((T, H))
        for t in range(T):
            for j in range(TOPK):
                ff[t] += wts[t, j] * expert(f + f'experts.{idx[t, j]}.',
                                            h[t])
        ff += expert(f + 'shared_experts.', h)
        x = (post[..., None] * ff[:, None, :]
             + np.einsum('tos,tsh->toh', comb, x))

    xf = x.reshape(T, HC * H)
    mix = _rms_scale(xf @ wd['hc_head_fn'].T.astype(np.float64), xf)
    pre = _sigmoid(mix * wd['hc_head_scale'] + wd['hc_head_base']) + HC_EPS
    y = (pre[..., None] * x).sum(1)
    y = _rms(y, wd['norm.weight'])
    return y[-1] @ wd['head.weight'].T.astype(np.float64)


def ref_greedy(wd, prompt, n):
    ids = list(prompt)
    out = []
    for _ in range(n):
        nxt = int(np.argmax(ref_logits(wd, ids)))
        out.append(nxt)
        ids.append(nxt)
    return out


def _engine(model_dir, **over):
    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import TpuEngineConfig
    kw = dict(dtype='float32', block_size=16, num_gpu_blocks=32,
              max_batch_size=2, session_len=128, max_prefill_token_num=64)
    kw.update(over)
    return Engine.from_pretrained(model_dir, TpuEngineConfig(**kw))


def _gen(eng, sid, prompt, n):
    from lmdeploy_tpu.messages import GenerationConfig

    async def run():
        inst = eng.create_instance()
        out = await inst.async_infer(sid, prompt,
                                     GenerationConfig(max_new_tokens=n,
                                                      ignore_eos=True))
        await inst.async_end(sid)
        return list(out.token_ids)

    loop = asyncio.new_event_loop()
    try:
        return loop.run_until_complete(run())
    finally:
        loop.close()


def test_greedy_matches_reference(v4_dir):
    """37-token prompt (>> window 8, covering several r=4 and r=8 compressed
    emits, topk selection, hash + topk MoE routing, hc streams) + 10 greedy
    tokens must match the full-sequence numpy reference."""
    rng = np.random.RandomState(7)
    prompt = rng.randint(3, V - 1, size=37).tolist()
    want = ref_greedy(_make_weights(), prompt, 10)
    eng = _engine(v4_dir)
    try:
        got = _gen(eng, 1, prompt, 10)
    finally:
        eng.close()
    assert got == want, (got, want)


def test_chunked_prefill_matches_one_shot(v4_dir):
    """Tiny prefill chunks must give identical greedy tokens — compressor
    ring states and window attention carry across chunk boundaries."""
    rng = np.random.RandomState(9)
    prompt = rng.randint(3, V - 1, size=41).tolist()
    big = _engine(v4_dir, max_prefill_token_num=64)
    try:
        want = _gen(big, 1, prompt, 8)
    finally:
        big.close()
    small = _engine(v4_dir, max_prefill_token_num=16)
    try:
        got = _gen(small, 2, prompt, 8)
    finally:
        small.close()
    assert got == want, (got, want)
