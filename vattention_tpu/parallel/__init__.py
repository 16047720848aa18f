from vattention_tpu.parallel.mesh import make_serving_mesh
from vattention_tpu.parallel.sharding import (llama_param_specs,
                                              regroup_gate_up_for_tp,
                                              regroup_qkv_for_tp)

__all__ = ["make_serving_mesh", "llama_param_specs",
           "regroup_gate_up_for_tp", "regroup_qkv_for_tp"]
