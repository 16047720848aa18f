"""Per-phase step-time breakdown: vattn vs paged at matched state.

Tool for chasing the 5-17% long-context makespan gap (docs/PERF.md
"open item"): builds both engines at the same geometry, drives them to
the SAME serving state (N requests, prefill fully processed), then
times (a) decode-only steps and (b) mixed chunk steps separately with
the chained method.  Since the two backends share kernel bodies, any
per-phase delta localizes the gap (attention vs append vs engine).

Usage: python scripts/profile_backend_step.py [--ctx 16384] [--batch 4]
       [--steps 30] [--model yi-6b-200k-l16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")


def drive(model, backend, ctx, batch, steps, kv_quant):
    from vattention_tpu import LLMEngine, SamplingParams
    from vattention_tpu.metrics.metrics_store import MetricsStore

    MetricsStore._instance = None
    engine = LLMEngine.from_engine_args(
        model=model, load_format="zero", kv_quant=kv_quant,
        attention_backend=backend, scheduler_type="sarathi",
        chunk_size=2048, max_model_len=ctx + 256,
        max_batch_size=batch, max_num_seqs=batch,
        gpu_memory_utilization=0.95)
    for i in range(batch):
        engine.add_request(
            prompt=None,
            prompt_token_ids=[(13 * i + j) % 1000 + 1 for j in range(ctx)],
            sampling_params=SamplingParams(
                temperature=0.0, max_tokens=100_000, ignore_eos=True),
            seq_id=f"p{i}")

    # timed prefill phase (all chunk steps until prompts are done)
    t0 = time.perf_counter()
    n_prefill_steps = 0
    while True:
        engine.step()
        n_prefill_steps += 1
        sched = engine.scheduler
        if all(s.prompt_processing_finished for s in sched.running) \
                and not sched.waiting:
            break
        assert n_prefill_steps < 10_000
    t_prefill = time.perf_counter() - t0

    # warm decode signature, then timed decode steady state
    for _ in range(3):
        engine.step()
    t0 = time.perf_counter()
    for _ in range(steps):
        engine.step()
    t_decode = (time.perf_counter() - t0) / steps
    engine.cleanup()
    MetricsStore._instance = None
    import gc

    gc.collect()
    return t_prefill, n_prefill_steps, t_decode


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="yi-6b-200k-l16")
    p.add_argument("--ctx", type=int, default=16384)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--kv-quant", default="fp8")
    p.add_argument("--backends", nargs="+",
                   default=["fa_vattn_2mb", "fa_paged_256"])
    args = p.parse_args()

    print("backend\tprefill_total_s\tprefill_steps\tdecode_s_per_step")
    for backend in args.backends:
        tp, ns, td = drive(args.model, backend, args.ctx, args.batch,
                           args.steps, args.kv_quant)
        print(f"{backend}\t{tp:.2f}\t{ns}\t{td*1e3:.2f}ms")


if __name__ == "__main__":
    main()
