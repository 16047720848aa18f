"""POD fused prefill+decode backend (ref FA_POD wrapper,
vattention_flashattention_pod_wrapper.py:21-203).

Mixed steps run both phases in ONE fused Pallas kernel
(ops/pod_fused.py); single-phase steps fall back to the plain vattn
kernels, mirroring the reference's fallback
(fused_attn_interface.py:39-77).  The FA_STREAMS backends (two CUDA
streams, the POD baseline) have no TPU analog -- a TPU core owns one
execution queue -- so they map to the serial vattn path.
"""

from __future__ import annotations

import jax.numpy as jnp

from vattention_tpu.model_executor.attention.vattn_backend import (
    VattnAttentionBackend,
)
from vattention_tpu.model_executor.step_inputs import StepInputs
from vattention_tpu.ops.pod_fused import pod_fused_attention


class PodAttentionBackend(VattnAttentionBackend):
    def attend(self, q, kv_cache, inputs: StepInputs, layer_idx,
               n_prefill_tokens: int, *, sm_scale: float,
               kv_len_hint=None):
        if n_prefill_tokens > 0 and inputs.pod_sched is not None \
                and q.shape[0] > n_prefill_tokens:
            D = q.shape[-1]
            q = self._pad_heads(q, kv_cache.shape[-1])
            # every prefill run in the step fuses into one launch (the
            # reference wrapper is single-prefill, pod_wrapper.py:74-75
            # -- a CUDA grid constraint the TPU schedule doesn't share)
            op, od = pod_fused_attention(
                q[:n_prefill_tokens], q[n_prefill_tokens:], kv_cache,
                inputs.pod_sched, inputs.pre_seg_row,
                inputs.pre_seg_cum, inputs.pre_qinfo,
                layer_idx.astype(jnp.int32),
                inputs.dec_seg_row, inputs.dec_seg_cum,
                inputs.dec_seqlens, q_tile=self.q_tile,
                kv_tile=self.kv_tile, num_segments=self.num_segments,
                sm_scale=self._eff_sm_scale(sm_scale))
            return self._descale_out(
                jnp.concatenate([op, od], axis=0)[..., :D])
        return super().attend(q, kv_cache, inputs, layer_idx,
                              n_prefill_tokens, sm_scale=sm_scale,
                              kv_len_hint=kv_len_hint)
