from vattention_tpu.benchmark.capacity_search.capacity_search import (
    CapacitySearch,
)

__all__ = ["CapacitySearch"]
