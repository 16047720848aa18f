from vattention_tpu.benchmark.request_generator.base import (
    Request, RequestGeneratorRegistry)

__all__ = ["Request", "RequestGeneratorRegistry"]
