"""Causal 1-D convolutions with explicit streaming state.

The reference uses three slightly different causal-padding conventions
(modules/vqgan/modules/firefly.py:92-103, firefly_encoder.py:93-99,
causal_cnn.py:126-157 — see SURVEY.md §7 "Hard parts").  The ones on the
published inference path are:

* FishConvNet (firefly.py:100-103): left-pad `k_eff - stride` zeros, where
  `k_eff = (k - 1) * dilation + 1`.
* FishTransConvNet (firefly.py:131-138): ConvTranspose1d with
  `padding=stride`, `output_padding=stride % 2`, preceded by an input
  left-pad of 1 (stride == k//2) or pad (1, 1) (stride == k).

All ops here are channels-last (B, T, C) — the natural TPU layout — and every
op has a streaming form that carries a small input-tail state so that
`concat(stream(chunk_i)) == full(concat(chunk_i))` exactly (the reference's
only streaming-correctness property, causal_cnn.py:175-184, automated in
tests/test_conv.py).

Weight layout: (k, C_in // groups, C_out) for conv ("WIO"), and
(k, C_in, C_out) for transposed conv (torch layout transposed+flipped is done
in the checkpoint converter, runtime weights are already in this layout).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


def effective_kernel(kernel_size: int, dilation: int) -> int:
    return (kernel_size - 1) * dilation + 1


def conv1d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    *,
    stride: int = 1,
    dilation: int = 1,
    groups: int = 1,
    padding=((0, 0),),
) -> jax.Array:
    """Plain 1-D conv, channels-last.  x: (B, T, C_in), w: (k, C_in//g, C_out)."""
    y = jax.lax.conv_general_dilated(
        x.astype(w.dtype),  # compute in the params' dtype (bf16 inference)
        w,
        window_strides=(stride,),
        padding=padding,
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        y = y + b
    return y.astype(x.dtype)


def causal_conv1d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    *,
    stride: int = 1,
    dilation: int = 1,
    groups: int = 1,
) -> jax.Array:
    """FishConvNet-style causal conv: left-pad `k_eff - stride` zeros."""
    k_eff = effective_kernel(w.shape[0], dilation)
    return conv1d(
        x,
        w,
        b,
        stride=stride,
        dilation=dilation,
        groups=groups,
        padding=((k_eff - stride, 0),),
    )


class ConvState(NamedTuple):
    """Carried input tail for streaming causal conv: (B, k_eff - stride, C_in)."""

    tail: jax.Array


def causal_conv1d_init_state(
    batch: int,
    in_channels: int,
    kernel_size: int,
    *,
    stride: int = 1,
    dilation: int = 1,
    dtype=jnp.float32,
) -> ConvState:
    k_eff = effective_kernel(kernel_size, dilation)
    return ConvState(jnp.zeros((batch, k_eff - stride, in_channels), dtype))


def causal_conv1d_stream(
    state: ConvState,
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    *,
    stride: int = 1,
    dilation: int = 1,
    groups: int = 1,
):
    """Streaming step: returns (new_state, y).  Chunk length must be a
    multiple of `stride` for exact prefix consistency."""
    k_eff = effective_kernel(w.shape[0], dilation)
    ctx = jnp.concatenate([state.tail, x], axis=1)
    y = conv1d(
        ctx, w, b, stride=stride, dilation=dilation, groups=groups, padding=((0, 0),)
    )
    new_tail = ctx[:, ctx.shape[1] - (k_eff - stride) :] if k_eff > stride else ctx[:, :0]
    return ConvState(new_tail), y


def conv_transpose1d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    *,
    stride: int,
    padding: int = 0,
    output_padding: int = 0,
) -> jax.Array:
    """torch.nn.ConvTranspose1d semantics, channels-last.

    x: (B, T, C_in), w: (k, C_in, C_out) in the torch index convention
    (w[t, i, o] multiplies input at position contributing to output t).
    Output length: (T - 1) * stride - 2 * padding + k + output_padding.
    """
    k = w.shape[0]
    y = jax.lax.conv_general_dilated(
        x.astype(w.dtype),  # compute in the params' dtype (bf16 inference)
        jnp.flip(w, axis=0),
        window_strides=(1,),
        padding=((k - 1 - padding, k - 1 - padding + output_padding),),
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        y = y + b
    return y.astype(x.dtype)


def fish_trans_conv1d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    *,
    stride: int,
) -> jax.Array:
    """FishTransConvNet (firefly.py:114-138): causal upsampling transposed conv.

    Input is left-padded (1, 0) when stride == k//2, or padded (1, 1) when
    stride == k; the transposed conv uses padding=stride,
    output_padding=stride % 2.  Output length is exactly stride * T.
    """
    k = w.shape[0]
    if stride == k // 2:
        x = jnp.pad(x, ((0, 0), (1, 0), (0, 0)))
    elif stride == k:
        x = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
    return conv_transpose1d(
        x, w, b, stride=stride, padding=stride, output_padding=stride % 2
    )


class TransConvState(NamedTuple):
    """Streaming state for fish_trans_conv1d: carried input tail."""

    tail: jax.Array  # (B, ctx, C_in)


def _fish_trans_ctx(kernel_size: int, stride: int) -> int:
    """How many *input* frames of left context the op needs so that output
    frame t depends only on inputs <= t (verified causal in tests)."""
    if stride == kernel_size:
        return 1
    # stride == k // 2 case: padding=stride trims one full input frame of
    # output; each output sample mixes ceil(k/stride) inputs.
    return max((kernel_size - 1) // stride, 1)


def fish_trans_conv1d_init_state(
    batch: int, in_channels: int, kernel_size: int, stride: int, dtype=jnp.float32
) -> TransConvState:
    return TransConvState(
        jnp.zeros((batch, _fish_trans_ctx(kernel_size, stride), in_channels), dtype)
    )


def fish_trans_conv1d_stream(
    state: TransConvState,
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    *,
    stride: int,
):
    """Streaming fish_trans_conv1d: returns (new_state, y) with
    y.shape[1] == stride * x.shape[1].  The first call must be preceded by a
    state holding zeros (equivalent to the offline left-pad)."""
    k = w.shape[0]
    ctx = state.tail.shape[1]
    full = jnp.concatenate([state.tail, x], axis=1)
    # run the offline op on (ctx + T) frames and drop the first stride*ctx
    # output samples, which belong to already-emitted chunks.
    if stride == k // 2:
        inp = full  # offline pads 1 zero frame; the zero state provides it
        y = conv_transpose1d(
            inp, w, b, stride=stride, padding=stride, output_padding=stride % 2
        )
        y = y[:, (ctx - 1 + 1) * stride - stride :]
        y = y[:, stride * 0 :]
        # keep only the last stride*T samples
        y = y[:, y.shape[1] - stride * x.shape[1] :]
    elif stride == k:
        inp = jnp.pad(full, ((0, 0), (0, 1), (0, 0)))
        y = conv_transpose1d(
            inp, w, b, stride=stride, padding=stride, output_padding=stride % 2
        )
        y = y[:, y.shape[1] - stride * x.shape[1] :]
    else:
        raise NotImplementedError("only stride == k or stride == k//2 supported")
    new_tail = full[:, full.shape[1] - ctx :]
    return TransConvState(new_tail), y
