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
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *, softmax_dtype=jnp.float32,
    kv_len: int | None = None,
) -> jnp.ndarray:
    """Dense softmax(QK^T / sqrt(d)) V. Shapes: [B, H, T, D].

    ``kv_len``: only the first kv_len keys are attended (padded tail masked).
    """
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, dtype=softmax_dtype))
    logits = jnp.einsum("bhtd,bhsd->bhts", q, k, preferred_element_type=softmax_dtype)
    if kv_len is not None and kv_len < k.shape[-2]:
        mask = jnp.arange(k.shape[-2]) < kv_len
        logits = jnp.where(mask[None, None, None, :], logits, -1e30)
    probs = jax.nn.softmax(logits * scale, axis=-1)
    return jnp.einsum("bhts,bhsd->bhtd", probs.astype(v.dtype), v)


@functools.partial(jax.jit, static_argnames=("use_flash", "kv_len"))
def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    use_flash: bool = True,
    kv_len: int | None = None,
) -> jnp.ndarray:
    """Attention over [B, H, T, D] tensors.

    ``use_flash`` selects the Pallas TPU kernel when running on TPU;
    otherwise falls back to the XLA path automatically. ``kv_len`` masks the
    padded key tail (callers that pre-pad T to the flash block size avoid
    per-layer pad/slice copies entirely).
    """
    if use_flash and jax.default_backend() == "tpu":
        from .flash_attention import flash_attention

        return flash_attention(q, k, v, seq_len=kv_len)
    return reference_attention(q, k, v, kv_len=kv_len)
