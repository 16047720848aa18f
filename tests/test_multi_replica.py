"""Multi-replica benchmark launcher: N engine replicas, round-robin
request assignment, per-replica metrics stores merged into one
aggregate (ref: sarathi-lean benchmark_runner.py:201-348 +
metrics_store.py:867+)."""

import json
import os

import pytest


def test_two_replicas_complete_all_requests(tmp_path):
    from vattention_tpu.benchmark.benchmark_runner import (
        BenchmarkRunnerLauncher,
    )
    from vattention_tpu.metrics.metrics_store import MetricsStore

    MetricsStore._instance = None
    engine_kwargs = dict(
        model="tiny-llama-debug", dtype="float32", load_format="zero",
        attention_backend="fa_vattn", scheduler_type="sarathi",
        chunk_size=128, max_model_len=1024, max_batch_size=4,
        max_num_seqs=4, gpu_memory_utilization=0.8,
        write_metrics=True, output_dir=str(tmp_path))
    generator_config = dict(
        num_requests=4, prefill_tokens=100, decode_tokens=4,
        interval_generator="static", length_generator="fixed", seed=0)
    launcher = BenchmarkRunnerLauncher(
        engine_kwargs, "synthetic", generator_config,
        num_replicas=2, warmup=False)
    # replicas own distinct stores (true merge, not a shared singleton)
    assert launcher.replica_stores[0] is not launcher.replica_stores[1]
    assert (launcher.runners[0].engine.metrics_store
            is launcher.replica_stores[0])
    assert (launcher.runners[1].engine.metrics_store
            is launcher.replica_stores[1])
    # round-robin split
    assert len(launcher.runners[0].requests) == 2
    assert len(launcher.runners[1].requests) == 2

    summary = launcher.run()
    for r in launcher.runners:
        r.engine.cleanup()
    MetricsStore._instance = None

    assert summary["totals"]["num_replicas"] == 2
    assert summary["totals"]["completed_requests"] == 4
    # each replica completed its share; aggregate is the sum
    per = summary["per_replica_totals"]
    assert [p["completed_requests"] for p in per] == [2, 2]
    assert summary["totals"]["decode_tokens"] == sum(
        p["decode_tokens"] for p in per)
    # the merged request_e2e distribution covers all 4 requests
    assert summary["request_e2e_time"]["count"] == 4
    # aggregated artifacts written
    written = json.load(open(os.path.join(tmp_path, "summary.json")))
    assert written["request_e2e_time"]["count"] == 4
