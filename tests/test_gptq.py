"""GPTQ calibration + quantization (lite/gptq.py).

Reference analog: lmdeploy/lite/apis/gptq.py (AutoGPTQ-driven); here the
OBQ/GPTQ algorithm itself (Hessian error feedback) runs in numpy.
"""
import numpy as np
import pytest


def test_gptq_beats_rtn_on_output_error():
    """The point of GPTQ: for correlated inputs, error feedback through the
    Hessian gives lower OUTPUT error than round-to-nearest."""
    from lmdeploy_tpu.lite.gptq import gptq_quantize_matrix

    rng = np.random.RandomState(0)
    K, N, gs = 256, 128, 128
    # correlated input features (low-rank + noise), like real activations
    basis = rng.randn(K, 16)
    X = rng.randn(2048, 16) @ basis.T + 0.1 * rng.randn(2048, K)
    X = X.astype(np.float32)
    W = rng.randn(K, N).astype(np.float32) * 0.05
    H = (X.astype(np.float64).T @ X.astype(np.float64))

    q, s, z = gptq_quantize_matrix(W, H, group_size=gs)
    sr = np.repeat(s, gs, 0)
    zr = np.repeat(z, gs, 0)
    w_gptq = (q.astype(np.float32) - zr) * sr

    # plain RTN with the same grouping
    Wg = W.reshape(K // gs, gs, N)
    mn, mx = Wg.min(1), Wg.max(1)
    sc = np.where(mx - mn == 0, 1.0, (mx - mn) / 15.0)
    zp = np.clip(np.round(-mn / sc), 0, 15)
    qr = np.clip(np.round(Wg / sc[:, None] + zp[:, None]), 0, 15)
    w_rtn = ((qr - zp[:, None]) * sc[:, None]).reshape(K, N)

    err_gptq = float(((X @ (w_gptq - W)) ** 2).mean())
    err_rtn = float(((X @ (w_rtn - W)) ** 2).mean())
    assert err_gptq < 0.7 * err_rtn, (err_gptq, err_rtn)


def test_gptq_wire_format_roundtrip():
    from lmdeploy_tpu.lite.formats import (pack_gptq_qweight, pack_gptq_qzeros,
                                           unpack_gptq_qweight,
                                           unpack_gptq_qzeros)
    rng = np.random.RandomState(1)
    q = rng.randint(0, 16, (256, 64)).astype(np.uint8)
    np.testing.assert_array_equal(unpack_gptq_qweight(pack_gptq_qweight(q)), q)
    z = rng.randint(1, 16, (2, 64)).astype(np.uint8)     # clamped [1, 15]
    np.testing.assert_array_equal(
        unpack_gptq_qzeros(pack_gptq_qzeros(z)), z.astype(np.float32))


def test_auto_gptq_end_to_end(tiny_model_dir, tmp_path):
    """auto_gptq produces a loadable GPTQ checkpoint whose greedy trajectory
    tracks the fp engine's first tokens."""
    import asyncio

    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.lite.gptq import auto_gptq
    from lmdeploy_tpu.messages import GenerationConfig, TpuEngineConfig

    work = auto_gptq(tiny_model_dir, str(tmp_path / 'gptq'),
                     w_group_size=32, calib_samples=4, calib_seqlen=128)

    def gen(path):
        cfg = TpuEngineConfig(dtype='float32', block_size=16,
                              num_gpu_blocks=64, max_batch_size=4,
                              session_len=128, max_prefill_token_num=64)
        eng = Engine.from_pretrained(path, cfg)
        try:
            async def run():
                inst = eng.create_instance()
                out = await inst.async_infer(
                    1, [5, 17, 42, 99, 7, 23, 8],
                    GenerationConfig(max_new_tokens=6, ignore_eos=True))
                await inst.async_end(1)
                return list(out.token_ids)

            loop = asyncio.new_event_loop()
            try:
                return loop.run_until_complete(run())
            finally:
                loop.close()
        finally:
            eng.close()

    full = gen(tiny_model_dir)
    quant = gen(work)
    assert len(quant) == 6
    assert quant[:2] == full[:2]
