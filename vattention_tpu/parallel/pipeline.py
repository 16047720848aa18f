"""In-program pipeline parallelism (GPipe inside one jitted step).

ref: sarathi-lean PipelineParallelLLMEngine + PipelineParallelWorker
(engine/pipeline_parallel_llm_engine.py:34-198,
worker/pipeline_parallel_worker.py:26-105): the reference keeps up to
``num_pipeline_stages`` microbatches in flight with engine threads and
blocking NCCL send/recv at stage edges (pipeline_parallel/mappings.py:
12-41).  The TPU-native equivalent compiles the whole rotation into one
SPMD program: layer stacks are sharded over the "pp" mesh axis, every
stage runs the same code, and activations move stage-to-stage with
``ppermute`` -- microbatch m occupies stage s at tick t = m + s, so all
stages compute concurrently once the pipe fills.

The decode batch is split into ``num_micro`` equal microbatches.  A step
containing a prefill chunk is split by POSITION: the chunk's q tiles are
cut into ``num_micro`` contiguous sub-chunks (plus an equal share of the
decode slots), and causality makes the GPipe order correct for free --
sub-chunk m+1 enters stage s only after sub-chunk m has left it, so the
KV rows it attends to are already appended.  This is the TPU analog of
the reference keeping ``num_pipeline_stages`` batches in flight so
prefill iterations also overlap
(engine/pipeline_parallel_llm_engine.py:71-84); here the overlap is
compiled into one program instead of coordinated by engine threads.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from vattention_tpu.model_executor.step_inputs import StepInputs


def _tree_index(tree, i):
    return jax.tree.map(lambda x: x[i], tree)


def pipeline_stage_step(model, backend, params, kv_cache_local,
                        inputs_stacked: StepInputs, *,
                        n_pre: int, num_micro: int, num_stages: int,
                        pp_axis: str = "pp", kv_len_hint=None):
    """Body to run under shard_map over ``pp_axis``.

    params: embed/final_norm/lm_head replicated; params["layers"] is this
    stage's [Lp, ...] slice.  kv_cache_local: [Lp, 2, Hkv, R, D].
    inputs_stacked: StepInputs with a leading [M] microbatch axis
    (replicated).  Returns (kv_cache_local, logits [M, B_mb, V]) where
    only the LAST stage's logits are meaningful.
    """
    s = jax.lax.axis_index(pp_axis)
    M = num_micro
    pp = num_stages
    ex = _tree_index(inputs_stacked, 0)
    T = ex.token_ids.shape[0]
    H = model.arch.hidden_size
    V = (model.arch.vocab_size)

    x_buf = jnp.zeros((T, H), model.dtype)
    logits_buf = jnp.zeros((M, ex.sample_idx.shape[0], V), jnp.float32)
    kv_cache = kv_cache_local

    perm = [(i, i + 1) for i in range(pp - 1)]

    for t in range(M + pp - 1):
        m = t - s  # microbatch this stage works on at tick t
        valid = jnp.logical_and(m >= 0, m < M)
        m_c = jnp.clip(m, 0, M - 1)
        inp = _tree_index(inputs_stacked, m_c)
        # invalid ticks must not write the cache
        inp = inp._replace(append_rows=jnp.where(
            valid, inp.append_rows, -1))
        if inp.pre_runs is not None:
            # zero-length runs are skipped by the run-append kernel
            inp = inp._replace(pre_runs=jnp.where(valid, inp.pre_runs, 0))
        x_first = model.embed(params, inp.token_ids)
        x_in = jnp.where(s == 0, x_first, x_buf)
        x_out, kv_cache = model.run_layers(
            params["layers"], kv_cache, x_in, inp, backend, n_pre,
            kv_len_hint=kv_len_hint)
        # last stage: head + stash logits for this microbatch
        lg = model.head(params, x_out, inp.sample_idx)
        write = jnp.logical_and(valid, s == pp - 1)
        logits_buf = jax.lax.dynamic_update_index_in_dim(
            logits_buf,
            jnp.where(write, lg, logits_buf[m_c]), m_c, axis=0)
        # rotate activations to the next stage (ref blocking send/recv,
        # pipeline_parallel/mappings.py:12-41 -> compiled ppermute)
        if pp > 1:
            x_buf = jax.lax.ppermute(x_out, pp_axis, perm)

    return kv_cache, logits_buf


def split_microbatches(inputs: StepInputs, num_micro: int, n_pre: int
                       ) -> StepInputs:
    """Stack a decode-only StepInputs into [M, ...] microbatches.

    The B decode slots are split contiguously; slot-indexed arrays keep
    their position inside their microbatch (kernels see B/M slots).
    Prefill-region fields are zero-width when n_pre == 0.
    """
    assert n_pre == 0, "pipelined steps are decode-only (prefill runs M=1)"
    B = inputs.dec_seqlens.shape[0]
    assert B % num_micro == 0, (B, num_micro)
    Bm = B // num_micro

    def split_slot(x):  # [B, ...] -> [M, Bm, ...]
        return x.reshape((num_micro, Bm) + x.shape[1:])

    return StepInputs(
        token_ids=split_slot(inputs.token_ids),
        positions=split_slot(inputs.positions),
        append_rows=split_slot(inputs.append_rows),
        pre_seg_row=jnp.broadcast_to(
            inputs.pre_seg_row, (num_micro,) + inputs.pre_seg_row.shape),
        pre_seg_cum=jnp.broadcast_to(
            inputs.pre_seg_cum, (num_micro,) + inputs.pre_seg_cum.shape),
        pre_qinfo=jnp.broadcast_to(
            inputs.pre_qinfo, (num_micro,) + inputs.pre_qinfo.shape),
        dec_seg_row=split_slot(inputs.dec_seg_row),
        dec_seg_cum=split_slot(inputs.dec_seg_cum),
        dec_seqlens=split_slot(inputs.dec_seqlens),
        sample_idx=split_slot(
            jnp.where(inputs.sample_idx >= 0,
                      inputs.sample_idx % max(Bm, 1), -1)),
        temperatures=split_slot(inputs.temperatures),
        top_p=split_slot(inputs.top_p),
        top_k=split_slot(inputs.top_k),
        rng=jax.random.split(inputs.rng, num_micro),
        dec_tile_rows=(split_slot(inputs.dec_tile_rows)
                       if inputs.dec_tile_rows is not None else None),
    )


def split_mixed_microbatches(inputs: StepInputs, num_micro: int,
                             n_pre: int, q_tile: int):
    """Stack a MIXED (prefill + decode) StepInputs into [M, ...]
    microbatches by position.

    The prefill region is cut into M contiguous sub-chunks of W =
    n_pre/M tokens (token order preserved, so GPipe tick order satisfies
    intra-chunk causality -- see module docstring) and the B decode
    slots into M groups of B/M.  Per-microbatch token layout is
    [W prefill rows | B/M decode rows].

    ``pre_runs`` must already be split at W boundaries by the host
    (model_runner breaks append runs there when pp > 1); rows belonging
    to other microbatches are zeroed (the run-append kernel skips
    zero-length runs).

    Returns ``(stacked, m_sel)`` where ``m_sel [B]`` is the microbatch
    whose head output carries each slot's sampled logits.
    """
    M = num_micro
    W = n_pre // M
    B = inputs.dec_seqlens.shape[0]
    Bm = B // M
    assert n_pre % M == 0 and W % q_tile == 0 and B % M == 0

    def split_tok(x):  # [n_pre + B, ...] -> [M, W + Bm, ...]
        pre = x[:n_pre].reshape((M, W) + x.shape[1:])
        dec = x[n_pre:].reshape((M, Bm) + x.shape[1:])
        return jnp.concatenate([pre, dec], axis=1)

    def split_slot(x):  # [B, ...] -> [M, Bm, ...]
        return x.reshape((M, Bm) + x.shape[1:])

    def bcast(x):
        return (None if x is None
                else jnp.broadcast_to(x, (M,) + x.shape))

    # sample ownership: which microbatch computes each slot's logits
    si = inputs.sample_idx
    is_pre = jnp.logical_and(si >= 0, si < n_pre)
    is_dec = si >= n_pre
    m_sel = jnp.where(
        is_pre, si // W,
        jnp.where(is_dec, (si - n_pre) // Bm, 0)).astype(jnp.int32)
    loc = jnp.where(
        is_pre, si % W,
        jnp.where(is_dec, W + (si - n_pre) % Bm, -1)).astype(jnp.int32)
    mm = jnp.arange(M, dtype=jnp.int32)
    sample_m = jnp.where(m_sel[None, :] == mm[:, None], loc[None, :], -1)

    # per-microbatch append runs: keep rows whose (W-aligned-split) src
    # range falls in this microbatch's token window, rebased to it
    runs = inputs.pre_runs  # [S, 3] (dst_row0, src_tok0, n)
    src = runs[:, 1][None, :]
    own = jnp.logical_and(runs[:, 2][None, :] > 0,
                          jnp.logical_and(src >= mm[:, None] * W,
                                          src < (mm[:, None] + 1) * W))
    runs_b = jnp.broadcast_to(runs, (M,) + runs.shape)
    runs_m = jnp.where(
        own[..., None],
        jnp.stack([runs_b[..., 0], runs_b[..., 1] - (mm[:, None] * W),
                   runs_b[..., 2]], axis=-1),
        0)

    stacked = StepInputs(
        token_ids=split_tok(inputs.token_ids),
        positions=split_tok(inputs.positions),
        append_rows=split_tok(inputs.append_rows),
        pre_seg_row=bcast(inputs.pre_seg_row),
        pre_seg_cum=bcast(inputs.pre_seg_cum),
        pre_qinfo=bcast(inputs.pre_qinfo),
        dec_seg_row=split_slot(inputs.dec_seg_row),
        dec_seg_cum=split_slot(inputs.dec_seg_cum),
        dec_seqlens=split_slot(inputs.dec_seqlens),
        sample_idx=sample_m,
        temperatures=split_slot(inputs.temperatures),
        top_p=split_slot(inputs.top_p),
        top_k=split_slot(inputs.top_k),
        rng=jax.random.split(inputs.rng, M),
        pre_runs=runs_m,
        qt_run=inputs.qt_run.reshape(M, W // q_tile, 2),
        pre_tile_rows=bcast(inputs.pre_tile_rows),
        dec_tile_rows=(split_slot(inputs.dec_tile_rows)
                       if inputs.dec_tile_rows is not None else None),
    )
    return stacked, m_sel
