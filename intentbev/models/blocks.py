"""Shared residual building blocks (Flax, NHWC).

One BasicBlock implementation — the reference duplicates it in
``model_cnn.py:14-33`` and ``model_vit.py:19-34``. Layout is NHWC
(channels-last), the native layout for TPU convolutions; the MXU sees
every conv as a large batched matmul.

BatchNorm statistics live in the ``batch_stats`` collection and are
updated when ``train=True``, mirroring torch BatchNorm2d semantics.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

# Kaiming-normal fan-out init, parity with reference model_cnn.py:102-108.
conv_kernel_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class BasicBlock(nn.Module):
    """ResNet BasicBlock: conv-BN-ReLU x2 + identity/projection shortcut.

    Reference: model_cnn.py:14-33 (kernel size configurable; the stream
    stages use k=5, fusion uses k=3 — model_cnn.py:58-75).
    """

    planes: int
    stride: int = 1
    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        needs_projection = self.stride != 1 or x.shape[-1] != self.planes
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name=name,
        )
        # torch-style symmetric padding ((k-1)//2 each side, reference
        # model_cnn.py:7-9), NOT "SAME": for stride-2 convs SAME pads
        # asymmetrically (e.g. (1, 2) for k=5), sampling a half-pixel-shifted
        # grid — forwards could never match reference weights
        # (tools: intentbev.import_torch). Identical to SAME at stride 1.
        pad = (self.kernel_size - 1) // 2
        identity = x
        y = nn.Conv(
            self.planes,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            use_bias=False,
            kernel_init=conv_kernel_init,
            dtype=self.dtype,
            name="conv1",
        )(x)
        y = nn.relu(norm("bn1")(y))
        y = nn.Conv(
            self.planes,
            (self.kernel_size, self.kernel_size),
            padding=((pad, pad), (pad, pad)),
            use_bias=False,
            kernel_init=conv_kernel_init,
            dtype=self.dtype,
            name="conv2",
        )(y)
        y = norm("bn2")(y)
        if needs_projection:
            identity = nn.Conv(
                self.planes,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                kernel_init=conv_kernel_init,
                dtype=self.dtype,
                name="proj_conv",
            )(x)
            identity = norm("proj_bn")(identity)
        return nn.relu(y + identity)


class ResidualStage(nn.Module):
    """A stack of BasicBlocks; first block carries the stride/projection.

    Reference ``_make_layer`` (model_cnn.py:86-100).
    """

    planes: int
    num_blocks: int
    stride: int = 1
    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i in range(self.num_blocks):
            x = BasicBlock(
                planes=self.planes,
                stride=self.stride if i == 0 else 1,
                kernel_size=self.kernel_size,
                dtype=self.dtype,
                name=f"block{i}",
            )(x, train=train)
        return x


def ensure_nhwc(x: jnp.ndarray, channels: int) -> jnp.ndarray:
    """Accept NCHW (the reference's torch layout) or NHWC and return NHWC."""
    if x.ndim != 4:
        raise ValueError(f"expected rank-4 BEV tensor, got shape {x.shape}")
    if x.shape[-1] == channels:
        return x
    if x.shape[1] == channels:
        return jnp.transpose(x, (0, 2, 3, 1))
    raise ValueError(
        f"neither axis 1 nor axis 3 matches expected channels={channels}: {x.shape}"
    )
