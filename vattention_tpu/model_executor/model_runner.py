"""ModelRunner: input preparation + the jitted serving step.

ref: sarathi-lean/sarathi/model_executor/model_runner.py:46-259.
TPU-first: ``_prepare_inputs`` builds fixed-shape numpy arrays (prefills
before decodes, ref :79-106; decode tokens slot-indexed), and ``run``
executes ONE jitted program per step: embed -> L x (norm/qkv/rope/append/
attention/o/mlp) via lax.scan -> sampler.  Only two step signatures exist
(with and without a prefill region), so steady-state serving never
recompiles.
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vattention_tpu.config import SystemConfig
from vattention_tpu.core.datatypes.sequence import (
    SamplerOutput, SamplerOutputs, SequenceMetadata)
from vattention_tpu.logger import init_logger
from vattention_tpu.model_executor.attention.vattn_backend import (
    VattnAttentionBackend,
)
from vattention_tpu.model_executor.layers.sampler import sample_tokens
from vattention_tpu.model_executor.models import get_model_class
from vattention_tpu.model_executor.step_inputs import StepInputs
from vattention_tpu.model_executor.weight_utils import load_weights
from vattention_tpu.ops.utils import round_up

logger = init_logger(__name__)


class ModelRunner:
    def __init__(self, config: SystemConfig, cache_engine, *,
                 tp_axis: Optional[str] = None, seed: int = 0):
        self.config = config
        self.cache_engine = cache_engine
        arch = config.model_config.arch
        dtype = (jnp.bfloat16 if config.model_config.dtype == "bfloat16"
                 else jnp.float32)
        model_cls = get_model_class(arch.model_type)
        self.model = model_cls(
            arch, dtype=dtype,
            tp_size=config.parallel_config.tensor_parallel_size,
            tp_axis=tp_axis)
        self.params = load_weights(self.model, config.model_config, seed=seed)
        self.q_tile = 128
        self.chunk_budget = round_up(
            config.scheduler_config.get_max_num_batched_tokens(
                config.model_config.max_model_len), self.q_tile)
        self.B = config.cache_config.max_batch_size
        self.S = cache_engine.table_width
        if cache_engine.kind == "vattn":
            self.backend = VattnAttentionBackend(
                block_tokens=cache_engine.block_tokens,
                num_segments=self.S,
                max_context_len=config.model_config.max_model_len,
                arena_rows=cache_engine.allocator.arena_tokens,
                q_tile=self.q_tile,
                scratch_row=cache_engine.scratch_row)
        else:
            from vattention_tpu.model_executor.attention.paged_backend \
                import PagedAttentionBackend

            self.backend = PagedAttentionBackend(
                block_size=cache_engine.block_size,
                max_context_len=config.model_config.max_model_len,
                scratch_row=cache_engine.scratch_row,
                q_tile=self.q_tile)
        self._rng = jax.random.PRNGKey(seed)
        self._step_fn = functools.partial(
            jax.jit, static_argnames=("n_pre",),
            donate_argnums=(1,))(self._step)

    # ------------------------------------------------------------------ #
    def _step(self, params, kv_cache, inputs: StepInputs, n_pre: int):
        kv_cache, logits = self.model.forward(
            params, kv_cache, inputs, self.backend, n_pre)
        rng, step_rng = jax.random.split(inputs.rng)
        tokens = sample_tokens(logits, inputs.temperatures, inputs.top_p,
                               inputs.top_k, step_rng)
        tokens = jnp.where(inputs.sample_idx >= 0, tokens, -1)
        return kv_cache, tokens, rng

    # ------------------------------------------------------------------ #
    def _prepare_inputs(self, seq_metadata_list: List[SequenceMetadata]):
        ce = self.cache_engine
        prefills = [m for m in seq_metadata_list if m.is_prompt]
        decodes = [m for m in seq_metadata_list if not m.is_prompt]
        assert len(prefills) <= 1, (
            "one prefill chunk per step (scheduler contract)")

        if prefills:
            chunk = prefills[0].prompt_chunk_len
            n_pre = min(round_up(max(chunk, 1), self.q_tile),
                        max(self.chunk_budget, round_up(chunk, self.q_tile)))
            # whole-prompt schedulers can exceed the sarathi budget
            n_pre = round_up(chunk, self.q_tile)
        else:
            chunk = 0
            n_pre = 0
        B, S = self.B, self.S
        T = n_pre + B

        token_ids = np.zeros(T, np.int32)
        positions = np.zeros(T, np.int32)
        append_rows = np.full(T, -1, np.int32)
        pre_seg_row = np.zeros(S, np.int32)
        pre_seg_cum = np.zeros(S + 1, np.int32)
        pre_qinfo = np.zeros(2, np.int32)
        dec_seqlens = np.zeros(B, np.int32)
        sample_idx = np.full(B, -1, np.int32)
        temperatures = np.ones(B, np.float32)
        top_p = np.ones(B, np.float32)
        top_k = np.full(B, -1, np.int32)

        if prefills:
            meta = prefills[0]
            seq = meta.seq
            slot = ce.slot_of(meta.seq_id)
            processed = seq.get_num_prompt_tokens_processed()
            ids = seq.get_next_prompt_chunk_token_ids(chunk)
            token_ids[:chunk] = ids
            positions[:chunk] = np.arange(processed, processed + chunk)
            append_rows[:chunk] = ce.get_slot_rows(slot, processed, chunk)
            seg_row, seg_tok = ce.get_batch_segments()
            pre_seg_row[:] = seg_row[slot]
            pre_seg_cum[1:] = np.cumsum(seg_tok[slot])
            pre_qinfo[:] = (processed, processed + chunk)
            if processed + chunk == seq.get_prompt_len():
                sample_idx[slot] = chunk - 1
                sp = seq.sampling_params
                temperatures[slot] = sp.temperature
                top_p[slot] = sp.top_p
                top_k[slot] = sp.top_k

        seg_row, seg_tok = ce.get_batch_segments()
        dec_seg_row = seg_row.astype(np.int32)
        dec_seg_cum = np.zeros((B, S + 1), np.int32)
        dec_seg_cum[:, 1:] = np.cumsum(seg_tok, axis=1)

        for meta in decodes:
            seq = meta.seq
            slot = ce.slot_of(meta.seq_id)
            t = n_pre + slot
            token_ids[t] = seq.get_last_token_id()
            pos = seq.get_len() - 1
            positions[t] = pos
            append_rows[t] = ce.get_slot_rows(slot, pos, 1)[0]
            dec_seqlens[slot] = seq.get_len()
            sample_idx[slot] = t
            sp = seq.sampling_params
            temperatures[slot] = sp.temperature
            top_p[slot] = sp.top_p
            top_k[slot] = sp.top_k

        # one batched host->device transfer for the whole pytree: through
        # the remote-dispatch tunnel, per-array device_puts cost ~2ms each
        host_inputs = StepInputs(
            token_ids=token_ids,
            positions=positions,
            append_rows=append_rows,
            pre_seg_row=pre_seg_row,
            pre_seg_cum=pre_seg_cum,
            pre_qinfo=pre_qinfo,
            dec_seg_row=dec_seg_row,
            dec_seg_cum=dec_seg_cum,
            dec_seqlens=dec_seqlens,
            sample_idx=sample_idx,
            temperatures=temperatures,
            top_p=top_p,
            top_k=top_k,
            rng=self._rng,  # device-resident; split inside the step
        )
        return jax.device_put(host_inputs), n_pre

    # ------------------------------------------------------------------ #
    def run(self, seq_metadata_list: List[SequenceMetadata]
            ) -> SamplerOutputs:
        if not seq_metadata_list:
            return []
        inputs, n_pre = self._prepare_inputs(seq_metadata_list)
        kv_cache, tokens, self._rng = self._step_fn(
            self.params, self.cache_engine.kv_cache, inputs, n_pre=n_pre)
        self.cache_engine.kv_cache = kv_cache
        tokens = np.asarray(tokens)

        outputs: SamplerOutputs = []
        ce = self.cache_engine
        for meta in seq_metadata_list:
            seq = meta.seq
            slot = ce.slot_of(meta.seq_id)
            if meta.is_prompt:
                processed = seq.get_num_prompt_tokens_processed()
                completes = (processed + meta.prompt_chunk_len
                             == seq.get_prompt_len())
                if not completes:
                    continue
            outputs.append(SamplerOutput(meta.seq_id, int(tokens[slot])))
        return outputs
