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
import os
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
from vattention_tpu.model_executor.layers.sampler import (
    pack_samples, sample_tokens, unpack_samples)
from vattention_tpu.model_executor.models import get_model_class
from vattention_tpu.model_executor.step_inputs import StepInputs
from vattention_tpu.model_executor.weight_utils import load_weights
from vattention_tpu.ops.utils import round_up

logger = init_logger(__name__)


class StepHandle:
    """A dispatched-but-unmaterialized serving step (async execution)."""

    __slots__ = ("seq_metadata_list", "sampled", "samples", "n_top")

    def __init__(self, seq_metadata_list, sampled, samples, n_top=0):
        self.seq_metadata_list = seq_metadata_list
        # [(seq, slot, generation-at-dispatch)] for every sampled token
        self.sampled = sampled
        # device array [B, 2+2*n_top]: packed tokens + logprobs
        # (layers/sampler.pack_samples)
        self.samples = samples
        self.n_top = n_top

    def is_ready(self) -> bool:
        try:
            return self.samples.is_ready()
        except Exception:  # noqa: BLE001
            return True


class ModelRunner:
    def __init__(self, config: SystemConfig, cache_engine, *,
                 mesh=None, seed: int = 0):
        self.config = config
        self.cache_engine = cache_engine
        self.mesh = mesh
        pc = config.parallel_config
        self.tp = pc.tensor_parallel_size
        self.pp = pc.pipeline_parallel_size
        arch = config.model_config.arch
        dtype = (jnp.bfloat16 if config.model_config.dtype == "bfloat16"
                 else jnp.float32)
        model_cls = get_model_class(arch.model_type)
        tp_axis = "tp" if (mesh is not None and self.tp > 1) else None
        self.model = model_cls(arch, dtype=dtype, tp_size=self.tp,
                               tp_axis=tp_axis)
        if mesh is None:
            self.params = load_weights(self.model, config.model_config,
                                       seed=seed)
        else:
            # global full-dim params, regrouped for even tp splits, laid
            # out by XLA according to the Megatron partition specs
            from jax.sharding import NamedSharding

            from vattention_tpu.parallel.sharding import (
                llama_param_specs, regroup_gate_up_for_tp,
                regroup_qkv_for_tp)

            full = model_cls(arch, dtype=dtype, tp_size=1, tp_axis=None)
            params = load_weights(full, config.model_config, seed=seed)
            if self.tp > 1:
                params["layers"]["qkv_w"] = regroup_qkv_for_tp(
                    params["layers"]["qkv_w"], arch.num_q_heads,
                    arch.num_kv_heads, arch.head_dim, self.tp)
                params["layers"]["gate_up_w"] = regroup_gate_up_for_tp(
                    params["layers"]["gate_up_w"], self.tp)
            self.param_specs = llama_param_specs(
                tp_axis="tp" if self.tp > 1 else None,
                pp_axis="pp" if self.pp > 1 else None,
                qkv_bias=arch.qkv_bias,
                tie_word_embeddings=arch.tie_word_embeddings)
            self.params = jax.device_put(
                params, jax.tree.map(
                    lambda s: NamedSharding(mesh, s), self.param_specs,
                    is_leaf=lambda x: isinstance(
                        x, jax.sharding.PartitionSpec)))
        # q-tile rows per prefill grid step (VATTN_Q_TILE: larger tiles
        # cut the attention grid's per-step fixed cost at depth, at the
        # price of coarser chunk-budget granularity).  MUST equal the
        # scheduler's charge unit -- single source in config.
        from vattention_tpu.config import PREFILL_TOKEN_PAD

        self.q_tile = PREFILL_TOKEN_PAD
        self.use_kv_hints = getattr(config, "dynamic_kv_len_buckets",
                                    False)
        self.max_prefills = getattr(
            config.scheduler_config, "max_prefills_per_step", 4)
        self.chunk_budget = round_up(
            config.scheduler_config.get_max_num_batched_tokens(
                config.model_config.max_model_len), self.q_tile)
        # fixed prefill-region width (see _prepare_inputs): chunked
        # schedulers charge prefills against the budget in q-tile units
        # (PREFILL_TOKEN_PAD), so padded runs always fit chunk_budget
        self.n_pre_fixed = self.chunk_budget
        if self.pp > 1:
            # mixed-step pipelining cuts the prefill region into pp
            # microbatches of whole q tiles
            self.n_pre_fixed = round_up(self.n_pre_fixed,
                                        self.pp * self.q_tile)
        # pp > 1: append runs must not cross prefill-microbatch
        # boundaries (parallel/pipeline.split_mixed_microbatches)
        self.pp_run_split = (self.n_pre_fixed // self.pp
                             if self.pp > 1 else None)
        self.B = config.cache_config.max_batch_size
        self.S = cache_engine.table_width
        # top-N alternative logprobs returned per sampled token (0 =
        # only the sampled token's logprob, which is always computed --
        # one logsumexp next to the lm-head matmul is free, and it
        # rides in the same packed fetch as the token ids)
        self.logprobs_top = getattr(config.model_config, "max_logprobs",
                                    0)
        from vattention_tpu.model_executor.attention import (
            AttentionBackend)

        self.is_pod = AttentionBackend.is_pod(
            config.model_config.attention_backend)
        if AttentionBackend.is_no_op(config.model_config.attention_backend):
            from vattention_tpu.model_executor.attention.no_op_backend \
                import NoOpAttentionBackend

            assert not self.is_pod, "no_op cannot be combined with pod"
            self.backend = NoOpAttentionBackend()
        elif cache_engine.kind == "vattn" and self.is_pod:
            from vattention_tpu.model_executor.attention.pod_backend \
                import PodAttentionBackend

            self.backend = PodAttentionBackend(
                block_tokens=cache_engine.block_tokens,
                num_segments=self.S,
                max_context_len=config.model_config.max_model_len,
                arena_rows=cache_engine.allocator.arena_tokens,
                q_tile=self.q_tile,
                scratch_row=cache_engine.scratch_row,
                sliding_window=arch.sliding_window,
                kv_scale=getattr(cache_engine, "kv_scale", None))
        elif cache_engine.kind == "vattn":
            self.backend = VattnAttentionBackend(
                block_tokens=cache_engine.block_tokens,
                num_segments=self.S,
                max_context_len=config.model_config.max_model_len,
                arena_rows=cache_engine.allocator.arena_tokens,
                q_tile=self.q_tile,
                scratch_row=cache_engine.scratch_row,
                sliding_window=arch.sliding_window,
                kv_scale=getattr(cache_engine, "kv_scale", None))
        else:
            from vattention_tpu.model_executor.attention.paged_backend \
                import PagedAttentionBackend

            self.backend = PagedAttentionBackend(
                block_size=cache_engine.block_size,
                max_context_len=config.model_config.max_model_len,
                scratch_row=cache_engine.scratch_row,
                q_tile=self.q_tile,
                kv_scale=getattr(cache_engine, "kv_scale", None))
        # captured at construction: under multi-replica serving each
        # engine owns its own store and the class singleton points at
        # whichever replica was built last
        from vattention_tpu.metrics.metrics_store import MetricsStore

        self._metrics_store = MetricsStore.get_instance()
        self._rng = jax.random.PRNGKey(seed)
        # persistent device buffer of each slot's latest sampled token --
        # the on-device feedback path that lets the next decode step start
        # without waiting for sampled values to reach the host
        self._tok_buf = jnp.full(self.B, -1, jnp.int32)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            rep = NamedSharding(mesh, PartitionSpec())
            self._tok_buf = jax.device_put(self._tok_buf, rep)
            self._rng = jax.device_put(self._rng, rep)
        if mesh is None:
            self._step_fn = functools.partial(
                jax.jit, static_argnames=("n_pre", "kv_len_hint"),
                donate_argnums=(1, 2))(self._step)
        else:
            self._step_fn = functools.partial(
                jax.jit, static_argnames=("n_pre", "kv_len_hint"),
                donate_argnums=(1, 2))(self._step_parallel)

    # ------------------------------------------------------------------ #
    def _step_parallel(self, params, kv_cache, tok_buf, inputs: StepInputs,
                       n_pre: int, kv_len_hint=None):
        """Sharded serving step: pp pipeline x tp inside shard_map."""
        inputs = self._splice_prev_tokens(inputs, tok_buf, n_pre)
        from jax.sharding import PartitionSpec as P

        from vattention_tpu.parallel.pipeline import (
            pipeline_stage_step, split_microbatches,
            split_mixed_microbatches)
        from vattention_tpu.parallel.sharding import kv_cache_spec

        B = inputs.dec_seqlens.shape[0]
        m_sel = None
        n_pre_micro = n_pre
        if n_pre == 0 and self.pp > 1 and B % self.pp == 0:
            M = self.pp
            stacked = split_microbatches(inputs, M, 0)
        elif (n_pre > 0 and self.pp > 1 and B % self.pp == 0
              and n_pre % (self.pp * self.q_tile) == 0
              and not self.is_pod):
            # mixed steps pipeline too: the chunk is cut by position so
            # prefill iterations overlap across stages (ref keeps
            # num_stages batches in flight, pipeline_parallel_llm_engine
            # .py:71-84; here it is one compiled rotation)
            M = self.pp
            stacked, m_sel = split_mixed_microbatches(
                inputs, M, n_pre, self.q_tile)
            n_pre_micro = n_pre // M
        else:
            M = 1
            stacked = jax.tree.map(lambda x: x[None], inputs)
        cache_spec = kv_cache_spec(
            tp_axis="tp" if self.tp > 1 else None,
            pp_axis="pp" if self.pp > 1 else None)

        def body(params, kv_cache, stacked_inputs):
            return pipeline_stage_step(
                self.model, self.backend, params, kv_cache,
                stacked_inputs, n_pre=n_pre_micro, num_micro=M,
                num_stages=self.pp, pp_axis="pp",
                kv_len_hint=kv_len_hint)

        sm = jax.shard_map(
            body, mesh=self.mesh,
            in_specs=(self.param_specs, cache_spec,
                      jax.tree.map(lambda _: P(), stacked)),
            out_specs=(cache_spec, P("pp" if self.pp > 1 else None)),
            check_vma=False)
        kv_cache, logits_all = sm(params, kv_cache, stacked)
        # last stage's logits [M, Bm or B, V]
        logits = logits_all[-M:] if self.pp > 1 else logits_all
        V = logits.shape[-1]
        if n_pre == 0:
            logits = logits.reshape(-1, V)[:B]
        elif m_sel is not None:
            # mixed microbatches emit slot-aligned [M, B, V]; each
            # slot's logits come from the microbatch owning its sample
            logits = jnp.take_along_axis(
                logits, m_sel[None, :, None], axis=0)[0]
        else:
            logits = logits.reshape(-1, V)
        rng, step_rng = jax.random.split(inputs.rng)
        tokens = sample_tokens(logits, inputs.temperatures, inputs.top_p,
                               inputs.top_k, step_rng)
        tokens = jnp.where(inputs.sample_idx >= 0, tokens, -1)
        tok_buf = jnp.where(tokens >= 0, tokens, tok_buf)
        samples = pack_samples(logits, tokens, self.logprobs_top)
        return kv_cache, tok_buf, samples, rng

    def _splice_prev_tokens(self, inputs: StepInputs, tok_buf, n_pre: int):
        """Decode slots flagged use_prev_tok read their input token from the
        device buffer (previous step's sample) instead of the host array."""
        if inputs.use_prev_tok is None:
            return inputs
        dec = inputs.token_ids[n_pre:]
        dec = jnp.where(inputs.use_prev_tok, tok_buf, dec)
        token_ids = (jnp.concatenate([inputs.token_ids[:n_pre], dec])
                     if n_pre else dec)
        return inputs._replace(token_ids=token_ids)

    def _step(self, params, kv_cache, tok_buf, inputs: StepInputs,
              n_pre: int, kv_len_hint=None):
        inputs = self._splice_prev_tokens(inputs, tok_buf, n_pre)
        kv_cache, logits = self.model.forward(
            params, kv_cache, inputs, self.backend, n_pre,
            kv_len_hint=kv_len_hint)
        rng, step_rng = jax.random.split(inputs.rng)
        tokens = sample_tokens(logits, inputs.temperatures, inputs.top_p,
                               inputs.top_k, step_rng)
        tokens = jnp.where(inputs.sample_idx >= 0, tokens, -1)
        tok_buf = jnp.where(tokens >= 0, tokens, tok_buf)
        samples = pack_samples(logits, tokens, self.logprobs_top)
        return kv_cache, tok_buf, samples, rng

    # ------------------------------------------------------------------ #
    def _prepare_inputs(self, seq_metadata_list: List[SequenceMetadata]):
        ce = self.cache_engine
        prefills = [m for m in seq_metadata_list if m.is_prompt]
        decodes = [m for m in seq_metadata_list if not m.is_prompt]
        K_max = self.max_prefills
        assert len(prefills) <= K_max, (
            f"{len(prefills)} prefill runs > max_prefills_per_step "
            f"{K_max} (scheduler contract)")

        # each prefill run padded to the q tile; runs concatenated.  The
        # TOTAL prefill region is then padded to ONE fixed width so every
        # mixed step shares a single jit signature: variable last-chunk /
        # rolling-split sizes otherwise mint a fresh n_pre each (a 64K
        # grid run paid 3 extra ~14s compiles mid-makespan for exactly
        # this).  Tail q tiles map to an empty run (index K_max) whose
        # kv_len=0 marks every kv tile dead, so the pad costs only
        # skipped grid steps.
        chunks = [m.prompt_chunk_len for m in prefills]
        pads = [round_up(max(c, 1), self.q_tile) for c in chunks]
        run_offs = np.concatenate(
            [[0], np.cumsum(pads)]).astype(np.int64)
        n_pre = int(run_offs[-1])
        if prefills:
            # chunked schedulers guarantee n_pre <= n_pre_fixed (padded
            # budget accounting); whole-prompt schedulers (vllm/orca/ft)
            # may exceed it -- a doubling ladder keeps their signature
            # count logarithmic
            fixed = self.n_pre_fixed
            while fixed < n_pre:
                fixed *= 2
            n_pre = fixed
        B, S = self.B, self.S
        T = n_pre + B

        token_ids = np.zeros(T, np.int32)
        positions = np.zeros(T, np.int32)
        append_rows = np.full(T, -1, np.int32)
        pre_seg_row = np.zeros((K_max + 1, S), np.int32)
        pre_seg_cum = np.zeros((K_max + 1, S + 1), np.int32)
        pre_qinfo = np.zeros((K_max + 1, 2), np.int32)
        qt_run = np.zeros((n_pre // self.q_tile, 2), np.int32)
        qt_run[:, 0] = K_max  # default: the empty run
        dec_seqlens = np.zeros(B, np.int32)
        sample_idx = np.full(B, -1, np.int32)
        temperatures = np.ones(B, np.float32)
        top_p = np.ones(B, np.float32)
        top_k = np.full(B, -1, np.int32)
        use_prev_tok = np.zeros(B, bool)

        seg_row_all, seg_tok_all = ce.get_batch_segments()
        for i, meta in enumerate(prefills):
            chunk = chunks[i]
            off = int(run_offs[i])
            seq = meta.seq
            slot = ce.slot_of(meta.seq_id)
            processed = seq.get_num_prompt_tokens_processed()
            ids = seq.get_next_prompt_chunk_token_ids(chunk)
            token_ids[off:off + chunk] = ids
            positions[off:off + chunk] = np.arange(
                processed, processed + chunk)
            append_rows[off:off + chunk] = ce.get_slot_rows(
                slot, processed, chunk)
            pre_seg_row[i] = seg_row_all[slot]
            pre_seg_cum[i, 1:] = np.cumsum(seg_tok_all[slot])
            pre_qinfo[i] = (processed, processed + chunk)
            for lqt in range(pads[i] // self.q_tile):
                qt_run[off // self.q_tile + lqt] = (i, lqt)
            if processed + chunk == seq.get_prompt_len():
                sample_idx[slot] = off + chunk - 1
                sp = seq.sampling_params
                temperatures[slot] = sp.temperature
                top_p[slot] = sp.top_p
                top_k[slot] = sp.top_k

        dec_seg_row = seg_row_all.astype(np.int32)
        dec_seg_cum = np.zeros((B, S + 1), np.int32)
        dec_seg_cum[:, 1:] = np.cumsum(seg_tok_all, axis=1)
        dec_tile_rows = None
        pre_tile_rows = None
        if hasattr(self.backend, "dec_sub"):
            from vattention_tpu.ops.utils import tile_rows_from_segments

            dec_tile_rows = tile_rows_from_segments(
                dec_seg_row, dec_seg_cum, self.backend.dec_sub,
                self.backend.dec_n_sub)
            if prefills:
                pre_tile_rows = tile_rows_from_segments(
                    pre_seg_row, pre_seg_cum, self.backend.pre_sub,
                    self.backend.pre_n_sub)

        for meta in decodes:
            seq = meta.seq
            slot = ce.slot_of(meta.seq_id)
            t = n_pre + slot
            if seq.num_pending_tokens > 0:
                # async execution: the value is still on device -- the
                # step splices it in from the persistent token buffer
                use_prev_tok[slot] = True
            else:
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

        # run budget: a chunk breaks at block boundaries at worst, so
        # n_pre tokens span at most cdiv(n_pre, block) + K runs.  Sizing
        # by the block-table width instead (a previous bug) exploded the
        # append kernel's grid to table_width x windows -- at 128K the
        # paged engine paid ~33k no-op grid steps per prefill step and
        # the scalar-prefetch buffer blew the 1MB SMEM limit.
        bt = (getattr(ce, "block_tokens", None)
              or getattr(ce, "block_size", 1))
        max_runs = max(8, -(-n_pre // max(bt, 1)) + K_max + 1
                       + (self.pp if self.pp_run_split else 0))
        pre_runs = np.zeros((max_runs, 3), np.int32)
        nrun = 0
        for i in range(len(prefills)):
            # decompose each chunk's arena rows into contiguous runs;
            # src_tok indexes the (padded) prefill token region
            chunk = chunks[i]
            off = int(run_offs[i])
            r = append_rows[off:off + chunk]
            breaks = np.nonzero(np.diff(r) != 1)[0] + 1
            if self.pp_run_split is not None:
                Wb = self.pp_run_split
                lo = (off // Wb + 1) * Wb
                extra = np.arange(lo, off + chunk, Wb,
                                  dtype=np.int64) - off
                breaks = np.union1d(breaks, extra).astype(np.int64)
            starts = np.concatenate([[0], breaks])
            ends = np.concatenate([breaks, [chunk]])
            assert nrun + len(starts) <= max_runs, (
                "chunks cross more extents than the run budget")
            for a, b in zip(starts, ends):
                pre_runs[nrun] = (r[a], off + a, b - a)
                nrun += 1
        pod_sched = None
        if self.is_pod and prefills and any(dec_seqlens > 0):
            from vattention_tpu.ops.pod_fused import (POD_KV_LEN_LIMIT,
                                                      build_pod_schedule)

            # fall back to serial kernels (sched=None) past the
            # validated fused-kernel depth -- mirrors the reference's
            # own single-phase fallback (fused_attn_interface.py:39-77)
            if int(pre_qinfo[:len(prefills), 1].max()) \
                    <= POD_KV_LEN_LIMIT:
                # weave only the REAL chunks' q tiles; the fixed-width
                # region's tail tiles would add full kv-depth walks of
                # garbage work to the schedule
                pod_sched = build_pod_schedule(
                    chunks, self.q_tile, self.backend.kv_tile,
                    pre_qinfo[:len(prefills)], dec_seqlens)
        # one batched host->device transfer for the whole pytree: through
        # the remote-dispatch tunnel, per-array device_puts cost ~2ms each.
        # On a mesh the inputs are placed replicated explicitly -- in
        # multi-controller (multi-host) serving every process builds the
        # SAME host arrays and a global replicated array is the only
        # valid placement for a mesh-spanning jit.
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
            dec_tile_rows=dec_tile_rows,
            sample_idx=sample_idx,
            temperatures=temperatures,
            top_p=top_p,
            top_k=top_k,
            rng=self._rng,  # device-resident; split inside the step
            pod_sched=pod_sched,
            pre_runs=pre_runs if prefills else None,
            use_prev_tok=use_prev_tok,
            qt_run=qt_run if prefills else None,
            pre_tile_rows=pre_tile_rows,
        )
        # static pow2-bucketed live-depth hint: bounds the attention
        # kernels' kv-tile grids to this step's real depth instead of
        # max_model_len (the skipped-tile grid tail costs ~2-3us per
        # step per layer).  Buckets keep the signature count log2-small
        # and recompiles rare (a growing context crosses each bucket
        # once).
        def bucket(n):
            b = 512
            while b < n:
                b *= 2
            return b
        pre_kv_max = int(pre_qinfo[:, 1].max()) if prefills else 0
        dec_kv_max = int(dec_seqlens.max()) if decodes else 0
        kv_len_hint = None
        if self.use_kv_hints:
            kv_len_hint = (bucket(pre_kv_max) if pre_kv_max else 0,
                           bucket(dec_kv_max) if dec_kv_max else 0)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            return jax.device_put(
                host_inputs, NamedSharding(self.mesh, PartitionSpec())
            ), n_pre, kv_len_hint
        return jax.device_put(host_inputs), n_pre, kv_len_hint

    # ------------------------------------------------------------------ #
    def run_async(self, seq_metadata_list: List[SequenceMetadata]
                  ) -> "StepHandle":
        """Dispatch one serving step without waiting for its results.

        The sampled tokens stay on device (and feed the next step through
        the persistent token buffer); a device->host copy is started
        asynchronously so ``resolve`` later finds it already landed.  TPU
        analog of the reference overlapping allocation/steps with forward
        (vattention.cu:549-558) -- here it is the sampled-token round trip
        that must be hidden, not cuMemMap.
        """
        import time as _time

        from vattention_tpu.metrics.constants import CpuOperationMetrics

        _t0 = _time.perf_counter()
        inputs, n_pre, kv_len_hint = self._prepare_inputs(
            seq_metadata_list)
        self._metrics_store.push_cpu_operation_time(
            CpuOperationMetrics.PREPARE_INPUTS, _time.perf_counter() - _t0)
        kv_cache, self._tok_buf, samples, self._rng = self._step_fn(
            self.params, self.cache_engine.kv_cache, self._tok_buf,
            inputs, n_pre=n_pre, kv_len_hint=kv_len_hint)
        self.cache_engine.kv_cache = kv_cache
        try:
            samples.copy_to_host_async()
        except Exception:  # noqa: BLE001 -- not all backends support it
            pass

        ce = self.cache_engine
        sampled = []
        for meta in seq_metadata_list:
            seq = meta.seq
            if meta.is_prompt:
                processed = seq.get_num_prompt_tokens_processed()
                if processed + meta.prompt_chunk_len < seq.get_prompt_len():
                    continue  # mid-prompt chunk: nothing sampled
            sampled.append((seq, ce.slot_of(meta.seq_id), seq.generation))
        return StepHandle(seq_metadata_list, sampled, samples,
                          self.logprobs_top)

    @staticmethod
    def resolve(handle: "StepHandle") -> SamplerOutputs:
        """Materialize a dispatched step's sampled tokens (blocking)."""
        tokens, lps, top_ids, top_lps = unpack_samples(
            handle.samples, handle.n_top)
        return [SamplerOutput(
                    seq.seq_id, int(tokens[slot]),
                    logprob=float(lps[slot]),
                    top_logprobs=(
                        None if top_ids is None else
                        [(int(i), float(p)) for i, p in
                         zip(top_ids[slot], top_lps[slot])]))
                for seq, slot, gen in handle.sampled
                if seq.generation == gen]

    def run(self, seq_metadata_list: List[SequenceMetadata]
            ) -> SamplerOutputs:
        if not seq_metadata_list:
            return []
        return self.resolve(self.run_async(seq_metadata_list))
