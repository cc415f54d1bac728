"""Metrics & observability: request stats, iteration stats, loggers.

Reference analog: ``lmdeploy/metrics/stats.py`` (RequestStats:97 TTFT/TPOT/e2e,
IterationStats:195), ``metrics_processor.py`` (async queue), ``loggers.py``
(LoggingStatLogger:34, PrometheusStatLogger:131 -> here a pull-based /metrics
text exposition, no prometheus_client dependency needed).
"""
from __future__ import annotations

import time
from collections import deque
from dataclasses import dataclass, field
from typing import Deque, Dict, List, Optional


@dataclass
class RequestStats:
    """Lifecycle timings for one finished request."""

    arrival_time: float = 0.0
    first_scheduled_time: float = 0.0
    first_token_time: float = 0.0
    finish_time: float = 0.0
    prompt_tokens: int = 0
    generation_tokens: int = 0
    finish_reason: Optional[str] = None

    @property
    def ttft(self) -> float:
        if self.first_token_time and self.arrival_time:
            return self.first_token_time - self.arrival_time
        return 0.0

    @property
    def e2e_latency(self) -> float:
        if self.finish_time and self.arrival_time:
            return self.finish_time - self.arrival_time
        return 0.0

    @property
    def tpot(self) -> float:
        """Time per output token after the first."""
        n = self.generation_tokens - 1
        if n <= 0 or not (self.finish_time and self.first_token_time):
            return 0.0
        return (self.finish_time - self.first_token_time) / n


@dataclass
class IterationStats:
    """Per-engine-step counters."""

    num_prefill_tokens: int = 0
    num_decode_tokens: int = 0
    num_running: int = 0
    num_waiting: int = 0
    duration_s: float = 0.0


def _percentile(values: List[float], p: float) -> float:
    if not values:
        return 0.0
    values = sorted(values)
    idx = min(int(len(values) * p), len(values) - 1)
    return values[idx]


class MetricsAggregator:
    """Engine-wide rolling metrics; rendered by /metrics and logged periodically.

    Reference analog: metrics_processor + stat loggers collapsed into one pull-based
    aggregator (the TPU engine is single-process; no cross-worker queue needed).
    """

    def __init__(self, window: int = 1024):
        self.finished: Deque[RequestStats] = deque(maxlen=window)
        self.num_finished_total = 0
        self.num_aborted_total = 0
        self.prompt_tokens_total = 0
        self.generation_tokens_total = 0
        self.num_preemptions_total = 0
        self.iterations_total = 0
        self.start_time = time.time()

    def on_request_finished(self, stats: RequestStats):
        self.finished.append(stats)
        self.num_finished_total += 1
        self.prompt_tokens_total += stats.prompt_tokens
        self.generation_tokens_total += stats.generation_tokens
        if stats.finish_reason == 'abort':
            self.num_aborted_total += 1

    def on_iteration(self, it: IterationStats):
        self.iterations_total += 1

    def on_preemption(self):
        self.num_preemptions_total += 1

    def snapshot(self) -> Dict[str, float]:
        ttfts = [r.ttft for r in self.finished if r.ttft > 0]
        tpots = [r.tpot for r in self.finished if r.tpot > 0]
        e2es = [r.e2e_latency for r in self.finished if r.e2e_latency > 0]
        return {
            'num_requests_finished': self.num_finished_total,
            'num_requests_aborted': self.num_aborted_total,
            'prompt_tokens_total': self.prompt_tokens_total,
            'generation_tokens_total': self.generation_tokens_total,
            'num_preemptions_total': self.num_preemptions_total,
            'iterations_total': self.iterations_total,
            'ttft_mean_s': sum(ttfts) / len(ttfts) if ttfts else 0.0,
            'ttft_p50_s': _percentile(ttfts, 0.5),
            'ttft_p99_s': _percentile(ttfts, 0.99),
            'tpot_mean_s': sum(tpots) / len(tpots) if tpots else 0.0,
            'tpot_p50_s': _percentile(tpots, 0.5),
            'tpot_p99_s': _percentile(tpots, 0.99),
            'e2e_p50_s': _percentile(e2es, 0.5),
            'uptime_s': time.time() - self.start_time,
        }

    def prometheus_text(self, extra: Optional[Dict[str, float]] = None) -> str:
        lines = []
        snap = self.snapshot()
        if extra:
            snap.update(extra)
        for key, value in snap.items():
            lines.append(f'lmdeploy_{key} {value}')
        return '\n'.join(lines) + '\n'


class Profiler:
    """Client-side benchmark session stats (reference: lmdeploy/profiler.py:30)."""

    def __init__(self):
        self.sessions: List[Dict] = []

    def new_session(self) -> Dict:
        s = {'start': time.perf_counter(), 'first_token': None, 'tokens': 0,
             'end': None}
        self.sessions.append(s)
        return s

    @staticmethod
    def on_token(session: Dict):
        now = time.perf_counter()
        if session['first_token'] is None:
            session['first_token'] = now
        session['tokens'] += 1

    @staticmethod
    def on_finish(session: Dict):
        session['end'] = time.perf_counter()

    def summarize(self) -> Dict[str, float]:
        done = [s for s in self.sessions if s['end'] is not None]
        if not done:
            return {}
        ttfts = [s['first_token'] - s['start'] for s in done if s['first_token']]
        total_tokens = sum(s['tokens'] for s in done)
        t0 = min(s['start'] for s in done)
        t1 = max(s['end'] for s in done)
        return {
            'requests': len(done),
            'total_output_tokens': total_tokens,
            'output_tok_per_s': total_tokens / max(t1 - t0, 1e-9),
            'ttft_mean_s': sum(ttfts) / len(ttfts) if ttfts else 0.0,
            'ttft_p50_s': _percentile(ttfts, 0.5),
            'ttft_p99_s': _percentile(ttfts, 0.99),
            'duration_s': t1 - t0,
        }
