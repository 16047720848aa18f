"""Multi-host serving: 2-process CPU tier (ref multi-GPU runtime:
NCCL init base_worker.py:253-284 + Ray control plane ray_utils.py:11-58;
here jax.distributed + the replicated-engine control plane of
parallel/multihost.py).

Two OS processes, one virtual CPU device each, tp=2 spanning both.
Continuous batching runs the SAME engine in both processes; the driver
broadcasts request admissions.  Asserts both hosts produce identical
outputs, equal to a single-controller tp=2 run of the same requests.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

HELPER = os.path.join(os.path.dirname(__file__), "helpers",
                      "multihost_engine_proc.py")


def _clean_env():
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"
    return env


def test_two_process_serving_matches_single_controller():
    port = 19300 + (os.getpid() % 500) * 2
    procs = [
        subprocess.Popen(
            [sys.executable, HELPER, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=_clean_env())
        for pid in (0, 1)
    ]
    results = {}
    logs = {}
    for p in procs:
        out, _ = p.communicate(timeout=800)
        logs[p.pid] = out
        for line in out.splitlines():
            if line.startswith("MHRESULT "):
                r = json.loads(line[len("MHRESULT "):])
                results[r["pid"]] = r["outputs"]
        assert p.returncode == 0, out[-4000:]
    assert set(results) == {0, 1}, logs
    # every host computed the same outputs (replicated determinism)
    assert results[0] == results[1]
    assert sorted(results[0]) == ["mh0", "mh1", "mh2"]
    assert all(len(v) == 5 for v in results[0].values()), results[0]

    # single-controller tp=2 reference on the in-process 8-device mesh
    from vattention_tpu import LLMEngine, SamplingParams

    engine = LLMEngine.from_engine_args(
        model="tiny-llama-debug",
        dtype="float32",
        attention_backend="fa_vattn",
        scheduler_type="sarathi",
        chunk_size=128,
        max_model_len=512,
        max_batch_size=4,
        max_num_seqs=4,
        tensor_parallel_size=2,
        gpu_memory_utilization=0.9,
        enable_async_execution=False,
    )
    rng = np.random.default_rng(21)
    for i, n in enumerate([90, 50, 70]):
        engine.add_request(
            prompt=None, prompt_token_ids=rng.integers(1, 2000, n).tolist(),
            sampling_params=SamplingParams(
                temperature=0.0, max_tokens=5, ignore_eos=True),
            seq_id=f"mh{i}")
    expect = {}
    steps = 0
    while engine.has_unfinished_requests():
        for o in engine.step():
            if o.finished:
                expect[o.seq_id] = o.token_ids
        steps += 1
        assert steps < 300
    engine.cleanup()
    from vattention_tpu.metrics.metrics_store import MetricsStore
    MetricsStore._instance = None
    assert results[0] == expect, (results[0], expect)
