"""Rotary position embeddings with scaling variants.

ref: sarathi-lean/sarathi/model_executor/layers/rotary_embedding.py (344
LoC: RotaryEmbedding + Linear/DynamicNTK/YaRN scaling, factory get_rope
at :301).  TPU-first: no in-place CUDA op -- cos/sin are computed from
positions inside the jitted step and fused by XLA into the surrounding
elementwise ops.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np


class RotaryEmbedding:
    """Non-interleaved (rotate-half) RoPE, HF-Llama convention."""

    def __init__(self, head_dim: int, rotary_dim: int, max_position: int,
                 base: float):
        self.head_dim = head_dim
        self.rotary_dim = rotary_dim
        self.max_position = max_position
        self.base = base
        self.inv_freq = jnp.asarray(self._compute_inv_freq(base),
                                    dtype=jnp.float32)

    def _compute_inv_freq(self, base: float) -> np.ndarray:
        return 1.0 / (base ** (
            np.arange(0, self.rotary_dim, 2, dtype=np.float32)
            / self.rotary_dim))

    def _cos_sin(self, positions: jnp.ndarray):
        freqs = positions.astype(jnp.float32)[:, None] * self.inv_freq[None, :]
        return jnp.cos(freqs), jnp.sin(freqs)

    def __call__(self, positions: jnp.ndarray, q: jnp.ndarray,
                 k: jnp.ndarray):
        """positions: [T]; q: [T, Hq, D]; k: [T, Hkv, D]."""
        cos, sin = self._cos_sin(positions)  # [T, rot/2]
        cos = cos[:, None, :]
        sin = sin[:, None, :]

        def rot(x):
            xr = x[..., :self.rotary_dim].astype(jnp.float32)
            x1, x2 = jnp.split(xr, 2, axis=-1)
            o1 = x1 * cos - x2 * sin
            o2 = x2 * cos + x1 * sin
            out = jnp.concatenate([o1, o2], axis=-1).astype(x.dtype)
            if self.rotary_dim < x.shape[-1]:
                out = jnp.concatenate([out, x[..., self.rotary_dim:]], -1)
            return out

        return rot(q), rot(k)


class LinearScalingRotaryEmbedding(RotaryEmbedding):
    """ref rotary_embedding.py LinearScaling variant."""

    def __init__(self, head_dim, rotary_dim, max_position, base, factor):
        self.factor = factor
        super().__init__(head_dim, rotary_dim, max_position, base)

    def _cos_sin(self, positions):
        return super()._cos_sin(positions.astype(jnp.float32) / self.factor)


class DynamicNTKScalingRotaryEmbedding(RotaryEmbedding):
    """NTK-aware scaling: rebase theta by the context-stretch factor."""

    def __init__(self, head_dim, rotary_dim, max_position, base, factor):
        self.factor = factor
        adjusted = base * (
            (factor * max_position / max_position) - (factor - 1)
        ) ** (rotary_dim / (rotary_dim - 2))
        super().__init__(head_dim, rotary_dim, max_position * int(factor),
                         adjusted)


class YaRNScalingRotaryEmbedding(RotaryEmbedding):
    """YaRN scaling (ref rotary_embedding.py YaRN variant)."""

    def __init__(self, head_dim, rotary_dim, max_position, base, factor,
                 *, beta_fast: float = 32.0, beta_slow: float = 1.0,
                 extrapolation_factor: float = 1.0, attn_factor: float = 1.0):
        self.factor = factor
        self.beta_fast = beta_fast
        self.beta_slow = beta_slow
        self.extrapolation_factor = extrapolation_factor
        self.mscale = float(
            (0.1 * math.log(factor) + 1.0) * attn_factor if factor > 1
            else 1.0)
        self.orig_max_position = max_position
        super().__init__(head_dim, rotary_dim, max_position * int(factor),
                         base)

    def _find_dim(self, num_rotations: int) -> float:
        return (self.rotary_dim * math.log(
            self.orig_max_position / (num_rotations * 2 * math.pi))
        ) / (2 * math.log(self.base))

    def _compute_inv_freq(self, base: float) -> np.ndarray:
        pos_freqs = base ** (
            np.arange(0, self.rotary_dim, 2, dtype=np.float32)
            / self.rotary_dim)
        inv_freq_extrapolation = 1.0 / pos_freqs
        inv_freq_interpolation = 1.0 / (self.factor * pos_freqs)
        low = math.floor(self._find_dim(self.beta_fast))
        high = math.ceil(self._find_dim(self.beta_slow))
        low, high = max(low, 0), min(high, self.rotary_dim - 1)
        # linear ramp mask between low and high dims
        ramp = (np.arange(self.rotary_dim // 2, dtype=np.float32) - low) / \
            max(high - low, 1e-3)
        ramp = np.clip(ramp, 0.0, 1.0)
        mask = (1.0 - ramp) * self.extrapolation_factor
        return (inv_freq_interpolation * (1 - mask)
                + inv_freq_extrapolation * mask)

    def __call__(self, positions, q, k):
        q, k = super().__call__(positions, q, k)
        return q * self.mscale, k * self.mscale


def get_rope(head_dim: int, rotary_dim: int, max_position: int, base: float,
             rope_scaling: Optional[Dict[str, Any]] = None
             ) -> RotaryEmbedding:
    """Factory (ref rotary_embedding.py:301)."""
    if not rope_scaling:
        return RotaryEmbedding(head_dim, rotary_dim, max_position, base)
    scaling_type = rope_scaling.get("type", rope_scaling.get("rope_type"))
    factor = float(rope_scaling.get("factor", 1.0))
    if scaling_type == "linear":
        return LinearScalingRotaryEmbedding(
            head_dim, rotary_dim, max_position, base, factor)
    if scaling_type == "dynamic":
        return DynamicNTKScalingRotaryEmbedding(
            head_dim, rotary_dim, max_position, base, factor)
    if scaling_type == "yarn":
        return YaRNScalingRotaryEmbedding(
            head_dim, rotary_dim,
            rope_scaling.get("original_max_position_embeddings",
                             max_position),
            base, factor)
    # llama3-style and unknown types: fall back to plain rope
    return RotaryEmbedding(head_dim, rotary_dim, max_position, base)
