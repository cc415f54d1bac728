"""AnomalyHandler analog: count-and-fix NaN/Inf behind an env level flag.

Reference: ``src/turbomind/utils/anomaly_handler.h:17`` (level 1 = count,
level 2 = count + fix).
"""
import numpy as np
import jax.numpy as jnp
import pytest


@pytest.fixture(autouse=True)
def _reset(monkeypatch):
    from lmdeploy_tpu import anomaly
    anomaly.reset()
    yield
    anomaly.reset()
    monkeypatch.delenv('LMDEPLOY_TPU_ANOMALY_LEVEL', raising=False)


def _poisoned():
    x = np.arange(12, dtype=np.float32).reshape(3, 4)
    x[0, 1] = np.nan
    x[1, 2] = np.inf
    x[2, 3] = -np.inf
    return jnp.asarray(x)


def test_level0_identity(monkeypatch):
    from lmdeploy_tpu import anomaly
    monkeypatch.setenv('LMDEPLOY_TPU_ANOMALY_LEVEL', '0')
    x = _poisoned()
    y = anomaly.guard('t', x)
    assert y is x
    assert anomaly.counts() == {}


def test_level1_counts_without_fixing(monkeypatch):
    import jax
    from lmdeploy_tpu import anomaly
    monkeypatch.setenv('LMDEPLOY_TPU_ANOMALY_LEVEL', '1')
    y = jax.jit(lambda a: anomaly.guard('logits', a))(_poisoned())
    jax.effects_barrier()
    assert np.isnan(np.asarray(y)).any()          # NOT fixed at level 1
    assert anomaly.counts().get('logits') == 3


def test_level2_counts_and_fixes(monkeypatch):
    import jax
    from lmdeploy_tpu import anomaly
    monkeypatch.setenv('LMDEPLOY_TPU_ANOMALY_LEVEL', '2')
    y = np.asarray(jax.jit(
        lambda a: anomaly.guard('logits', a, fix_value=0.0, inf_value=1e30)
    )(_poisoned()))
    jax.effects_barrier()
    assert np.isfinite(y).all()
    assert y[0, 1] == 0.0 and y[1, 2] == 1e30 and y[2, 3] == -1e30
    assert anomaly.counts().get('logits') == 3


def test_engine_decode_with_fix_level(tiny_model_dir, monkeypatch):
    """The decode path runs with the guard enabled (exercised in-scan)."""
    import asyncio
    import jax
    from lmdeploy_tpu import anomaly
    from lmdeploy_tpu.engine.engine import Engine
    from lmdeploy_tpu.messages import GenerationConfig, TpuEngineConfig

    monkeypatch.setenv('LMDEPLOY_TPU_ANOMALY_LEVEL', '2')
    cfg = TpuEngineConfig(dtype='float32', block_size=16, num_gpu_blocks=32,
                          max_batch_size=4, session_len=128,
                          max_prefill_token_num=64)
    eng = Engine.from_pretrained(tiny_model_dir, cfg)

    async def run():
        inst = eng.create_instance()
        out = await inst.async_infer(
            1, [1, 5, 9], GenerationConfig(max_new_tokens=4, ignore_eos=True))
        await inst.async_end(1)
        return out.token_ids

    loop = asyncio.new_event_loop()
    try:
        ids = loop.run_until_complete(run())
    finally:
        eng.close()
        loop.close()
    jax.effects_barrier()
    assert len(ids) == 4
    # healthy weights -> zero anomalies counted, but the guarded executables ran
    assert anomaly.counts().get('decode.logits', 0) == 0
