from vattention_tpu.memory.allocator import (
    VAttentionAllocator,
    RelocationPlan,
    Relocation,
)

__all__ = ["VAttentionAllocator", "RelocationPlan", "Relocation"]
