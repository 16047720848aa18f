"""Pipeline-parallel LLM engine.

ref: sarathi-lean/sarathi/engine/pipeline_parallel_llm_engine.py:34-198.
The reference keeps ``num_pipeline_stages`` microbatches in flight with
four daemon threads (schedule / microbatch-watch / output) and blocking
NCCL send/recv between stage workers.  Here the pipeline rotation is
COMPILED INTO the serving step (parallel/pipeline.py): each engine step
splits its decode batch into ``pp`` microbatches that occupy all stages
concurrently, so the thread machinery collapses into the synchronous
engine loop while stage utilization matches the reference's in-flight
batching.
"""

from __future__ import annotations

from vattention_tpu.config import SystemConfig
from vattention_tpu.engine.base_llm_engine import BaseLLMEngine
from vattention_tpu.logger import init_logger

logger = init_logger(__name__)


class PipelineParallelLLMEngine(BaseLLMEngine):
    def __init__(self, config: SystemConfig):
        # in-program pipelining: the scheduler sees one batch in flight
        # (the microbatch concurrency lives inside the compiled step)
        config.scheduler_config.num_pipeline_stages = 1
        super().__init__(config)
        logger.info(
            "pipeline-parallel engine: %d stages (in-program GPipe)",
            config.parallel_config.pipeline_parallel_size)
