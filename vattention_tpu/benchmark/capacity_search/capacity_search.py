"""Capacity search: max sustainable QPS under latency SLOs.

ref: sarathi-lean/sarathi/benchmark/capacity_search/capacity_search.py:
72-244 -- bisection on Poisson arrival rate until the highest qps whose
scheduling-delay / TBT quantiles meet the SLO is found.  The reference
fans configurations out over a Ray cluster; here each probe is one
benchmark run on the local chip (replica fan-out composes at the script
level).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from vattention_tpu.logger import init_logger

logger = init_logger(__name__)


@dataclass
class SLOConfig:
    """ref capacity_search config: scheduling-delay / TBT SLO quantiles."""

    scheduling_delay_slo_s: float = 2.0
    scheduling_delay_quantile: float = 0.99
    tbt_slo_s: Optional[float] = None
    tbt_quantile: float = 0.99


class CapacitySearch:
    def __init__(self, engine_kwargs: dict, generator_config: dict,
                 slo: SLOConfig, *, num_requests: int = 64,
                 time_limit_s: float = 600.0):
        self.engine_kwargs = engine_kwargs
        self.generator_config = dict(generator_config)
        self.slo = slo
        self.num_requests = num_requests
        self.time_limit_s = time_limit_s
        # probe history (qps, measured delay quantile, slo_ok) -- kept so
        # the committed artifact shows the evidence behind the bisection,
        # not just its endpoint.
        self.probes: list[dict] = []

    def _probe(self, qps: float) -> bool:
        """Run one benchmark at ``qps``; True iff SLOs hold."""
        from vattention_tpu.benchmark.benchmark_runner import BenchmarkRunner
        from vattention_tpu.metrics.metrics_store import MetricsStore

        MetricsStore._instance = None
        cfg = dict(self.generator_config)
        cfg.update(qps=qps, num_requests=self.num_requests,
                   interval_generator="poisson")
        runner = BenchmarkRunner(
            dict(self.engine_kwargs, write_metrics=True), "synthetic",
            cfg, time_limit_s=self.time_limit_s)
        summary = runner.run()
        runner.engine.cleanup()
        delay_q = summary["scheduling_delay"]
        ok = True
        q = int(self.slo.scheduling_delay_quantile * 100)
        delay = delay_q.get(f"p{q}", delay_q.get("p99", 0.0))
        if delay > self.slo.scheduling_delay_slo_s:
            ok = False
        if self.slo.tbt_slo_s is not None:
            tbt = summary["tbt"].get("p99", 0.0)
            if tbt > self.slo.tbt_slo_s:
                ok = False
        logger.info("probe qps=%.2f -> delay_p%d=%.2fs slo_ok=%s",
                    qps, q, delay, ok)
        self.probes.append({
            "qps": qps, f"delay_p{q}": round(delay, 3),
            "tokens_per_s": round(
                summary["totals"].get("tokens_per_s", 0.0), 1),
            "slo_ok": ok,
        })
        return ok

    def search(self, qps_low: float = 0.25, qps_high: float = 16.0,
               tolerance: float = 0.25, max_iters: int = 8) -> float:
        """Bisection (ref capacity_search.py:106-244): largest qps whose
        probe meets the SLO, to within ``tolerance``."""
        if not self._probe(qps_low):
            logger.warning("SLO violated even at qps=%.2f", qps_low)
            return 0.0
        # grow upper bound until violation (capped: if the SLO never
        # binds the workload is too small to queue -- num_requests must
        # be >> max_batch_size for the search to mean anything)
        while self._probe(qps_high) and qps_high < 64:
            qps_low = qps_high
            qps_high *= 2
        if qps_high >= 64:
            logger.warning(
                "SLO never bound up to qps=%.0f -- workload too small "
                "to build a queue; raise num_requests", qps_high)
            return qps_low
        it = 0
        while qps_high - qps_low > tolerance and it < max_iters:
            mid = (qps_low + qps_high) / 2
            if self._probe(mid):
                qps_low = mid
            else:
                qps_high = mid
            it += 1
        return qps_low
