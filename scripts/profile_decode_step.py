"""Isolate device vs host time in the steady-state decode step.

Builds the same engine as bench.py, reaches decode steady state, then:
  A) times engine.step() (full serving loop: scheduler + prepare + dispatch)
  B) times the raw jitted step in a tight loop with fixed inputs
     (pure device throughput; donation-cycled kv/tok buffers)
The difference is host-side overhead not hidden by async execution.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="yi-6b-200k")
    p.add_argument("--backend", default="fa_vattn_256kb")
    p.add_argument("--batch", type=int, default=24)
    p.add_argument("--ctx", type=int, default=1024)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--max-model-len", type=int, default=2048)
    args = p.parse_args()

    from vattention_tpu import LLMEngine, SamplingParams

    engine = LLMEngine.from_engine_args(
        model=args.model, load_format="zero",
        attention_backend=args.backend, scheduler_type="sarathi",
        chunk_size=512, max_model_len=args.max_model_len,
        max_batch_size=args.batch, max_num_seqs=args.batch,
        gpu_memory_utilization=0.9)

    for i in range(args.batch):
        engine.add_request(
            prompt=None,
            prompt_token_ids=[(7 * i + j) % 1000 + 1
                              for j in range(args.ctx)],
            sampling_params=SamplingParams(temperature=0.0,
                                           max_tokens=100_000,
                                           ignore_eos=True),
            seq_id=f"b{i}")
    while True:
        engine.step()
        sched = engine.scheduler
        if all(s.prompt_processing_finished for s in sched.running) \
                and not sched.waiting:
            break

    runner = engine.worker.model_runner
    for _ in range(3):
        engine.step()

    # A) full engine loop
    t0 = time.perf_counter()
    for _ in range(args.steps):
        engine.step()
    jax.block_until_ready(runner._tok_buf)
    a = (time.perf_counter() - t0) / args.steps

    # B) raw jitted step, fixed inputs -- capture the next engine step's
    # prepared inputs via a hook (re-scheduling out-of-band would corrupt
    # sequence-manager state)
    captured = {}
    orig_prepare = runner._prepare_inputs

    def capture(metas):
        out = orig_prepare(metas)
        captured["inputs"], captured["n_pre"] = out
        captured["metas"] = metas
        return out

    runner._prepare_inputs = capture
    engine.step()
    runner._prepare_inputs = orig_prepare
    inputs, n_pre, metas = (captured["inputs"], captured["n_pre"],
                            captured["metas"])
    assert n_pre == 0, "expected pure-decode steady state"
    kv = engine.worker.cache_engine.kv_cache
    tok = runner._tok_buf
    # warm
    kv, tok, tokens, rng = runner._step_fn(runner.params, kv, tok, inputs,
                                           n_pre=0)
    jax.block_until_ready(tokens)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        kv, tok, tokens, rng = runner._step_fn(runner.params, kv, tok,
                                               inputs, n_pre=0)
    jax.block_until_ready(tokens)
    b = (time.perf_counter() - t0) / args.steps
    engine.worker.cache_engine.kv_cache = kv
    runner._tok_buf = tok

    # C) host-side prepare_inputs cost alone
    t0 = time.perf_counter()
    for _ in range(10):
        runner._prepare_inputs(metas)
    c = (time.perf_counter() - t0) / 10

    print(f"engine.step():        {a*1e3:8.2f} ms/step "
          f"({args.batch/a:8.1f} tok/s)")
    print(f"raw device step:      {b*1e3:8.2f} ms/step "
          f"({args.batch/b:8.1f} tok/s)")
    print(f"prepare_inputs(host): {c*1e3:8.2f} ms")
    print(f"host overhead not hidden: {(a-b)*1e3:8.2f} ms/step")


if __name__ == "__main__":
    main()
