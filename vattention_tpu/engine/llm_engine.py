"""LLMEngine façade (ref: sarathi-lean/sarathi/engine/llm_engine.py:6-19)."""

from __future__ import annotations

from vattention_tpu.engine.arg_utils import EngineArgs
from vattention_tpu.engine.base_llm_engine import BaseLLMEngine


class LLMEngine:
    @classmethod
    def from_engine_args(cls, **kwargs) -> BaseLLMEngine:
        engine_args = EngineArgs(**kwargs)
        return cls.from_system_config(engine_args.create_engine_configs())

    @classmethod
    def from_system_config(cls, config) -> BaseLLMEngine:
        if config.parallel_config.pipeline_parallel_size > 1:
            from vattention_tpu.engine.pipeline_parallel_llm_engine import (
                PipelineParallelLLMEngine,
            )

            return PipelineParallelLLMEngine(config)
        return BaseLLMEngine(config)
