"""Per-operation device timing (OperationMetrics producer).

ref: sarathi-lean/sarathi/metrics/cuda_timer.py:10-67 -- the reference
attaches CUDA events to every linear / collective / attention sub-phase
inside the step (base_attention_wrapper.py:36-39), gated by
``enable_op_level_metrics``.

Under XLA the serving step is ONE fused program: there is no place to
put an event between ops, and any in-program host timing would break the
fusion being measured.  The TPU-native equivalent measures each op
category in isolation at the model's real shapes (params, arena, batch)
with chained device execution -- the same op-attribution semantics the
reference's event timing provides (its op-level mode also serializes the
stream), feeding the same ``OperationMetrics`` rows of summary.json.

Run via ``BaseWorker.profile_op_level()`` (benchmark harness:
``--enable-op-level-metrics``).
"""

from __future__ import annotations

import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from vattention_tpu.metrics.constants import OperationMetrics
from vattention_tpu.metrics.metrics_store import MetricsStore


def _timeit(fn, *args, iters: int):
    """Median wall time of a jitted chained-N program / N."""
    g = jax.jit(fn)
    jax.block_until_ready(g(*args))  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(g(*args))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def _chain(f, iters):
    """Serialize N applications of f(x)->y (y shaped like x)."""
    def run(x, *rest):
        def body(c, _):
            return f(c, *rest), None
        return jax.lax.scan(body, x, None, length=iters)[0]
    return run


def _chain_dep(f, iters):
    """Serialize N applications when f's output shape differs from its
    input: a cheap scalar of the output is folded into the carry."""
    def run(x, *rest):
        def body(c, _):
            y = f(c, *rest)
            return c + (jnp.sum(y) * 0).astype(c.dtype), None
        return jax.lax.scan(body, x, None, length=iters)[0]
    return run


def profile_operations(runner, *, ctx: int = 1024,
                       iters: int = 8) -> Dict[str, float]:
    """Measure per-op device times at the runner's serving shapes and
    push them into the MetricsStore.  Returns {op_name: seconds}."""
    from vattention_tpu.model_executor.layers.activation import silu_and_mul
    from vattention_tpu.model_executor.layers.layernorm import rms_norm
    from vattention_tpu.model_executor.layers.sampler import sample_tokens
    from vattention_tpu.ops.cache_append import cache_append_tokens
    from vattention_tpu.ops.utils import tile_rows_from_segments

    model = runner.model
    arch = model.arch
    ce = runner.cache_engine
    store = MetricsStore.get_instance()
    B = runner.B
    D = model.head_dim
    Hq, Hkv = model.hq, model.hkv
    hidden = arch.hidden_size
    dtype = jnp.bfloat16 if runner.config.model_config.dtype == "bfloat16" \
        else jnp.float32
    params = runner.params
    lp = jax.tree.map(lambda p: p[0], params["layers"])
    kv_cache = ce.kv_cache
    Dp = kv_cache.shape[-1]
    ctx = min(ctx, runner.config.model_config.max_model_len)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, hidden)), dtype)
    q = jnp.asarray(rng.standard_normal((B, Hq, Dp)), dtype)
    k1 = jnp.asarray(rng.standard_normal((B, Hkv, Dp)), dtype)
    results: Dict[str, float] = {}

    def rec(op, seconds):
        results[op.value] = seconds
        store.push_operation_time(op, seconds)

    # projections / MLP / norms (per layer, decode batch)
    rec(OperationMetrics.ATTN_PRE_PROJ,
        _timeit(_chain_dep(lambda c: c @ lp["qkv_w"], iters), x,
                iters=iters))
    rec(OperationMetrics.ATTN_POST_PROJ,
        _timeit(_chain_dep(
            lambda c: c.reshape(B, -1)[:, :Hq * D] @ lp["o_w"], iters),
            q.reshape(B, -1), iters=iters))
    rec(OperationMetrics.MLP_UP_PROJ,
        _timeit(_chain_dep(lambda c: c @ lp["gate_up_w"], iters), x,
                iters=iters))
    up = jnp.asarray(rng.standard_normal(
        (B, lp["gate_up_w"].shape[1])), dtype)
    rec(OperationMetrics.MLP_ACTIVATION,
        _timeit(_chain_dep(lambda c: silu_and_mul(c), iters), up,
                iters=iters))
    act = silu_and_mul(up)
    rec(OperationMetrics.MLP_DOWN_PROJ,
        _timeit(_chain_dep(lambda c: c @ lp["down_w"], iters), act,
                iters=iters))
    rec(OperationMetrics.INPUT_LAYERNORM,
        _timeit(_chain(lambda c: rms_norm(
            c, lp["input_norm"], arch.rms_norm_eps).astype(c.dtype),
            iters), x, iters=iters))

    # rope (decode batch)
    positions = jnp.full((B,), ctx - 1, jnp.int32)
    def rope_fn(c):
        qr, _ = model.rope(positions, c[:, :Hq],
                           c[:, Hq:Hq + Hkv])
        return c.at[:, :Hq].set(qr.astype(c.dtype))
    qk = jnp.asarray(rng.standard_normal((B, Hq + Hkv, D)), dtype)
    rec(OperationMetrics.ATTN_ROPE,
        _timeit(_chain(rope_fn, iters), qk, iters=iters))

    # kv append (decode batch; arena RMW kernel)
    rows = jnp.asarray((np.arange(B) * max(ce.block_tokens, 32))
                       % max(kv_cache.shape[3] - 32, 1), jnp.int32)
    linfo = jnp.zeros(1, jnp.int32)
    def append_fn(c, kk, vv):
        return cache_append_tokens(c, kk, vv, rows, linfo)
    rec(OperationMetrics.ATTN_KV_CACHE_SAVE,
        _timeit(_chain(append_fn, iters), kv_cache, k1, v1 := k1,
                iters=iters))

    # decode attention at ctx
    backend = runner.backend
    if hasattr(backend, "dec_kv_tile"):
        bt = ce.block_tokens
        rows_per = -(-ctx // bt) * bt
        R = kv_cache.shape[3]
        sr = np.zeros((B, ce.table_width), np.int32)
        for b in range(B):
            sr[b, 0] = (b * rows_per) % max(R - rows_per, 1)
        sc = np.zeros((B, ce.table_width + 1), np.int32)
        sc[:, 1:] = rows_per
        n_tiles = -(-ctx // backend.dec_kv_tile)
        tile_rows = jnp.asarray(tile_rows_from_segments(
            sr, sc, backend.dec_sub, n_tiles * backend.dec_kv_fetch))
        seqlens = jnp.full((B,), ctx, jnp.int32)
        from vattention_tpu.ops.flash_decode import flash_decode

        def dec_fn(c):
            return flash_decode(
                c, kv_cache, tile_rows, seqlens, linfo,
                kv_tile=backend.dec_kv_tile,
                max_kv_tiles=n_tiles, kv_fetch=backend.dec_kv_fetch,
                seq_tile=backend.decode_seq_tile(
                    B, Hkv, Dp, jnp.dtype(kv_cache.dtype).itemsize))
        rec(OperationMetrics.ATTN_DECODE,
            _timeit(_chain(dec_fn, iters), q, iters=iters))

        # prefill attention: one 256-token chunk over ctx history
        from vattention_tpu.ops.flash_prefill import flash_prefill_multi

        Tq = 256
        qp = jnp.asarray(rng.standard_normal((Tq, Hq, Dp)), dtype)
        K = runner.max_prefills
        seg_row = np.zeros((K, ce.table_width), np.int32)
        seg_cum = np.zeros((K, ce.table_width + 1), np.int32)
        seg_cum[:, 1:] = rows_per
        qinfo = np.zeros((K, 2), np.int32)
        qinfo[0] = (ctx - Tq, ctx)
        qt_run = np.zeros((Tq // backend.q_tile, 2), np.int32)
        qt_run[:, 1] = np.arange(Tq // backend.q_tile)
        def pre_fn(c):
            return flash_prefill_multi(
                c, kv_cache, jnp.asarray(seg_row), jnp.asarray(seg_cum),
                jnp.asarray(qinfo), jnp.asarray(qt_run), linfo,
                q_tile=backend.q_tile, kv_tile=backend.wide_kv_tile,
                num_segments=backend.num_segments,
                max_kv_tiles=backend.wide_max_kv_tiles,
                kv_fetch=backend.wide_kv_fetch)
        rec(OperationMetrics.ATTN_PREFILL,
            _timeit(_chain(pre_fn, iters), qp, iters=iters))

    # lm head + sampler
    head = (params["embed"].T if arch.tie_word_embeddings
            else params["lm_head"])
    rec(OperationMetrics.LM_HEAD_LINEAR,
        _timeit(_chain_dep(lambda c: c @ head, iters), x, iters=iters))
    logits = jnp.asarray(rng.standard_normal((B, arch.vocab_size)),
                         jnp.float32)
    temps = jnp.zeros(B, jnp.float32)
    topp = jnp.ones(B, jnp.float32)
    topk = jnp.full(B, -1, jnp.int32)
    key = jax.random.PRNGKey(0)
    rec(OperationMetrics.SAMPLER,
        _timeit(_chain_dep(
            lambda c: sample_tokens(c, temps, topp, topk, key), iters),
            logits, iters=iters))

    # tp all-reduce (only when a mesh with tp axis exists)
    if runner.mesh is not None and runner.tp > 1:
        from jax.sharding import PartitionSpec as P

        def ar(c):
            return jax.shard_map(
                lambda y: jax.lax.psum(y, "tp"), mesh=runner.mesh,
                in_specs=P("tp"), out_specs=P(), check_vma=False)(c)
        xs = jnp.asarray(rng.standard_normal((runner.tp * B, hidden)),
                         dtype)
        rec(OperationMetrics.TP_ALL_REDUCE,
            _timeit(_chain_dep(ar, iters), xs, iters=iters))
    return results
