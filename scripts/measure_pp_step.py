"""PP cost/benefit measurement (VERDICT r4 #9).

Hardware reality: this repo runs on ONE v5e chip, so a real pp=2
speedup (two chips, layers split, microbatches in flight) cannot be
measured here.  What CAN be measured -- and what this script does -- is
the per-step overhead side of the trade on the virtual-device CPU tier:

  pp=1 on 1 virtual device  vs  pp=2 on 2 virtual devices

with the SAME total model, on mixed (prefill+decode) steps.  The pp=2
run executes the full in-program GPipe rotation (microbatch split,
ppermute boundary transfers, per-stage layer scan), so its measured
step time bounds the pipelining machinery's overhead.  The throughput
model for N real chips is then the standard GPipe bubble math:

  per-step speedup(pp, M=pp microbatches) = pp * M / (M + pp - 1)
  pp=2 -> 2*2/3 = 1.33x ideal over one chip; pp=4 -> 16/7 = 2.29x

(each stage holds 1/pp of the layers; the bubble is (pp-1)/(M+pp-1)).
The multichip dryrun (__graft_entry__.dryrun_multichip) separately
proves the sharded program compiles and runs on an 8-device mesh.

Usage: JAX_PLATFORMS=cpu python scripts/measure_pp_step.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def run(pp: int, steps: int = 24):
    from vattention_tpu import LLMEngine, SamplingParams
    from vattention_tpu.metrics.metrics_store import MetricsStore

    MetricsStore._instance = None
    engine = LLMEngine.from_engine_args(
        model="tiny-llama-debug", load_format="zero",
        attention_backend="fa_vattn", scheduler_type="sarathi",
        chunk_size=256, max_model_len=2048,
        max_batch_size=4, max_num_seqs=4,
        pipeline_parallel_size=pp,
        gpu_memory_utilization=0.9)
    rng = np.random.default_rng(3)
    # long prompts + early decoders -> a sustained run of MIXED steps
    for i in range(4):
        engine.add_request(
            prompt=None,
            prompt_token_ids=rng.integers(1, 2000, 1500 - 300 * i
                                          ).tolist(),
            sampling_params=SamplingParams(
                temperature=0.0, max_tokens=64, ignore_eos=True),
            seq_id=f"p{i}")
    # warm both serving signatures
    for _ in range(6):
        engine.step()
    mixed_times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        engine.step()
        mixed_times.append(time.perf_counter() - t0)
    engine.cleanup()
    MetricsStore._instance = None
    mixed_times.sort()
    return mixed_times[len(mixed_times) // 2]


def main():
    t1 = run(1)
    t2 = run(2)
    print(f"median mixed-step time  pp=1: {t1 * 1e3:8.1f} ms")
    print(f"median mixed-step time  pp=2: {t2 * 1e3:8.1f} ms")
    print(f"pp=2 machinery overhead vs pp=1 (same host, virtual "
          f"devices): {t2 / t1:5.2f}x")
    print("ideal 2-chip speedup from GPipe bubble math (M=pp=2): "
          "2*2/(2+1) = 1.33x per-step throughput")


if __name__ == "__main__":
    main()
