"""Cache engine factory (ref: sarathi-lean worker/cache_engine/__init__.py:8-25)."""

from __future__ import annotations

from vattention_tpu.config import SystemConfig
from vattention_tpu.model_executor.attention import AttentionBackend
from vattention_tpu.worker.cache_engine.base_cache_engine import (
    BaseCacheEngine,
)
from vattention_tpu.worker.cache_engine.vattn_cache_engine import (
    VAttnCacheEngine,
)


def get_cache_engine(config: SystemConfig, **kwargs) -> BaseCacheEngine:
    backend = config.model_config.attention_backend
    if AttentionBackend.is_vATTN(backend) or AttentionBackend.is_no_op(backend):
        return VAttnCacheEngine(config, **kwargs)
    from vattention_tpu.worker.cache_engine.paged_cache_engine import (
        PagedCacheEngine,
    )

    return PagedCacheEngine(config, **kwargs)
