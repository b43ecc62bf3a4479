"""Multi-head attention dispatch: Pallas flash kernel on TPU, XLA elsewhere.

The reference uses timm's dense MHSA which materialises the full 4501 x 4501
attention matrix per head (reference model_vit.py:119; SURVEY.md §5
'long-context'). Here attention is blockwise (flash-style) on TPU so memory
is O(T * block) and the kernel structure is ready for ring/context-parallel
sharding if token counts grow; the XLA einsum path is kept for CPU tests and
as a numerics oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def reference_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *, softmax_dtype=jnp.float32
) -> jnp.ndarray:
    """Dense softmax(QK^T / sqrt(d)) V. Shapes: [B, H, T, D]."""
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, dtype=softmax_dtype))
    logits = jnp.einsum("bhtd,bhsd->bhts", q, k, preferred_element_type=softmax_dtype)
    probs = jax.nn.softmax(logits * scale, axis=-1)
    return jnp.einsum("bhts,bhsd->bhtd", probs.astype(v.dtype), v)


@functools.partial(jax.jit, static_argnames=("use_flash",))
def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    use_flash: bool = True,
) -> jnp.ndarray:
    """Attention over [B, H, T, D] tensors.

    ``use_flash`` selects the Pallas TPU kernel when running on TPU;
    otherwise falls back to the XLA path automatically.
    """
    if use_flash and jax.default_backend() == "tpu":
        from .flash_attention import flash_attention

        return flash_attention(q, k, v)
    return reference_attention(q, k, v)
