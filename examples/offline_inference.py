"""Offline inference through LLMEngine directly.

ref: sarathi-lean/examples/offline_inference.py -- add requests, step
until done.  Runs the tiny debug model with dummy weights (token-id I/O),
so it works in zero-egress environments; pass --model <local-hf-dir> for
a real checkpoint.
"""

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/jax_comp_cache")
os.environ.setdefault(
    "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
import argparse
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="tiny-llama-debug")
    p.add_argument("--backend", default="fa_vattn")
    p.add_argument("--scheduler", default="sarathi")
    p.add_argument("--num-requests", type=int, default=4)
    p.add_argument("--prompt-len", type=int, default=180)
    p.add_argument("--max-tokens", type=int, default=24)
    p.add_argument("--max-model-len", type=int, default=4096)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (for smoke tests)")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from vattention_tpu import LLMEngine, SamplingParams

    engine = LLMEngine.from_engine_args(
        model=args.model,
        attention_backend=args.backend,
        scheduler_type=args.scheduler,
        max_model_len=args.max_model_len,
        max_batch_size=8,
        max_num_seqs=8,
        chunk_size=256,
    )

    rng_tokens = [[(13 + 7 * i + j) % 1000 + 1 for j in range(args.prompt_len)]
                  for i in range(args.num_requests)]
    for i, toks in enumerate(rng_tokens):
        engine.add_request(
            prompt=None, prompt_token_ids=toks,
            sampling_params=SamplingParams(
                temperature=0.0, max_tokens=args.max_tokens,
                ignore_eos=True),
            seq_id=f"req{i}")

    t0 = time.time()
    steps = 0
    done = {}
    while engine.has_unfinished_requests():
        outs = engine.step()
        steps += 1
        for out in outs:
            if out.finished:
                done[out.seq_id] = out
        if steps > 10000:
            raise RuntimeError("did not converge")
    dt = time.time() - t0

    for seq_id in sorted(done):
        out = done[seq_id]
        print(f"{seq_id}: prompt[:6]={out.prompt_token_ids[:6]} "
              f"-> generated {len(out.token_ids)} tokens: "
              f"{out.token_ids[:10]}... ({out.finish_reason})")
    total_tokens = sum(
        len(o.token_ids) + len(o.prompt_token_ids) for o in done.values())
    print(f"done: {len(done)} requests, {steps} steps, {dt:.1f}s, "
          f"{total_tokens/dt:.0f} tok/s")
    engine.cleanup()


if __name__ == "__main__":
    main()
