"""Device mesh construction for serving.

ref: sarathi-lean parallel_utils/parallel_state.py:49-216 -- the
reference builds TP/PP/DP NCCL process groups; the TPU equivalent is one
``jax.sharding.Mesh`` with named axes:

  "dp" -- serving replicas (outermost: DCN-friendly)
  "pp" -- pipeline stages
  "tp" -- tensor parallel (innermost: rides ICI)

Collectives are compiled into the step program (psum for TP row-linears,
ppermute between pipeline stages); there is no NCCL-style runtime to
initialize.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from vattention_tpu.logger import init_logger

logger = init_logger(__name__)

TP_AXIS = "tp"
PP_AXIS = "pp"
DP_AXIS = "dp"


def make_serving_mesh(tensor_parallel_size: int = 1,
                      pipeline_parallel_size: int = 1,
                      data_parallel_size: int = 1,
                      devices: Optional[list] = None):
    """Mesh shaped (dp, pp, tp); tp innermost so it maps to ICI
    neighbours (ref scaling recipe: TP traffic is the most
    latency-sensitive)."""
    import jax
    from jax.sharding import Mesh

    devices = devices if devices is not None else jax.devices()
    world = (data_parallel_size * pipeline_parallel_size
             * tensor_parallel_size)
    assert len(devices) >= world, (
        f"need {world} devices, have {len(devices)}")
    arr = np.array(devices[:world]).reshape(
        data_parallel_size, pipeline_parallel_size, tensor_parallel_size)
    return Mesh(arr, (DP_AXIS, PP_AXIS, TP_AXIS))
