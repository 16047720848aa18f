"""One process of the 2-process multi-host serving test.

Usage: python multihost_engine_proc.py <process_id> <num_processes> <port>

Each process: jax.distributed init (CPU backend, 1 virtual device per
process), builds the SAME engine with tp spanning both processes,
serves 3 requests through the replicated continuous-batching loop
(parallel/multihost.py), and prints the generated tokens as JSON so the
parent test can compare both hosts' outputs against the single-host
reference run.
"""

import json
import sys

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])


def main():
    pid, nproc, port = (int(a) for a in sys.argv[1:4])
    from vattention_tpu.parallel.multihost import (RequestControlPlane,
                                                   init_multihost,
                                                   serve_multihost)

    init_multihost(f"localhost:{port}", nproc, pid,
                   local_device_count=1)
    import jax

    assert len(jax.devices()) == nproc, jax.devices()

    from vattention_tpu import LLMEngine

    engine = LLMEngine.from_engine_args(
        model="tiny-llama-debug",
        dtype="float32",
        attention_backend="fa_vattn",
        scheduler_type="sarathi",
        chunk_size=128,
        max_model_len=512,
        max_batch_size=4,
        max_num_seqs=4,
        tensor_parallel_size=nproc,
        gpu_memory_utilization=0.9,
        enable_async_execution=False,
    )
    control = RequestControlPlane(pid, nproc, port=port + 1)
    requests = None
    if pid == 0:
        import numpy as np

        rng = np.random.default_rng(21)
        from vattention_tpu import SamplingParams

        requests = [
            dict(prompt=None,
                 prompt_token_ids=rng.integers(1, 2000, n).tolist(),
                 sampling_params=SamplingParams(
                     temperature=0.0, max_tokens=5, ignore_eos=True),
                 seq_id=f"mh{i}")
            for i, n in enumerate([90, 50, 70])
        ]
    outputs = serve_multihost(engine, control, requests=requests)
    control.close()
    print("MHRESULT " + json.dumps({"pid": pid, "outputs": outputs}),
          flush=True)


if __name__ == "__main__":
    main()
