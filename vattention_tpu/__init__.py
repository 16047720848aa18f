"""vattention_tpu: a TPU-native LLM serving engine (JAX/XLA/Pallas/pjit).

Re-creates the capabilities of microsoft/vattention (CUDA/PyTorch) with a
TPU-first design: a flat HBM KV arena whose per-request slabs stay physically
contiguous and grow on demand (run allocator + async relocation), dense Pallas
attention kernels that need no block-table indirection, a Sarathi-style
chunked-prefill continuous-batching scheduler, and GSPMD sharding for
tensor/pipeline parallelism over TPU meshes.
"""

__version__ = "0.1.0"

from vattention_tpu.core.datatypes.sampling_params import SamplingParams
from vattention_tpu.core.datatypes.request_output import RequestOutput

__all__ = [
    "SamplingParams",
    "RequestOutput",
    "LLMEngine",
    "EngineArgs",
]


def __getattr__(name):
    # Lazy imports to keep `import vattention_tpu` light (no jax import).
    if name == "LLMEngine":
        from vattention_tpu.engine.llm_engine import LLMEngine

        return LLMEngine
    if name == "EngineArgs":
        from vattention_tpu.engine.arg_utils import EngineArgs

        return EngineArgs
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
