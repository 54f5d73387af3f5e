"""Causal 1-D convolution primitives, TPU-first.

Replaces the reference's SConv1d / SConvTranspose1d
(`vibevoice/modular/modular_vibevoice_tokenizer.py:258-576`) with
channel-last (`[B, T, C]`) functional ops:

* `causal_conv1d`       — left-padded strided conv (XLA convolution, MXU path).
* `causal_conv_transpose1d` — transposed conv expressed as ONE matmul + frame
  overlap-add (instead of a scatter-style deconvolution), which maps directly
  onto the MXU and vectorizes the vocoder hot path.
* streaming variants carrying fixed-shape state pytrees, replacing the
  reference's dict-of-tensors `VibeVoiceTokenizerStreamingCache` (:193-256)
  so they can live inside `jax.lax.scan` / jitted decode steps with donation.

Weight layouts:
  conv weight      : [K, Cin, Cout]   (torch Conv1d is [Cout, Cin, K])
  conv_t weight    : [Cin, K, Cout]   (torch ConvTranspose1d is [Cin, Cout, K])
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

_DIMNUMS = ("NWC", "WIO", "NWC")


def causal_pad_amount(kernel_size: int, stride: int = 1, dilation: int = 1) -> int:
    """Left padding of the reference's causal SConv1d (ref :282-285)."""
    return (kernel_size - 1) * dilation - (stride - 1)


def _conv_windows(full: jnp.ndarray, stride: int) -> jnp.ndarray:
    """[B, (F+1)*stride, C] -> [B, F, 2*stride*C] sliding k=2s windows.

    For the k == 2*stride downsampling convs, window i covers exactly
    stride-blocks i and i+1 — two reshaped block views concatenated, no
    gather.  Row-major (time, channel) flattening matches a [K, Cin, Cout]
    conv weight flattened to [K*Cin, Cout]."""
    b, tt, c = full.shape
    r = stride
    blocks = full.reshape(b, tt // r, r * c)
    return jnp.concatenate([blocks[:, :-1], blocks[:, 1:]], axis=-1)


def _causal_conv1d_q(x, weight, bias, stride: int):
    """int8 path for a quantized k==2*stride downsampling conv: unfold to
    stride-block windows and run ONE int8 matmul (`quantize.mm`), so the
    weight streams from HBM at int8 bytes instead of being dequantized into
    a materialized bf16 convolution operand."""
    from ..utils.quantize import mm
    b, t, c = x.shape
    r = stride
    assert weight["qint8"].shape[0] == 2 * r * c, (
        "quantized conv expects k == 2*stride packing")
    f = -(-t // r)
    full = jnp.pad(x, ((0, 0), (r, f * r - t), (0, 0)))
    y = mm(_conv_windows(full, r), weight)
    if bias is not None:
        y = y + bias
    return y


def causal_conv1d(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    stride: int = 1,
    dilation: int = 1,
    groups: int = 1,
) -> jnp.ndarray:
    """Causal conv over [B, T, C]; output [B, ceil(T/stride), Cout].

    Matches the reference non-streaming path (left pad `(k-1)d-(s-1)`, right
    pad to complete frames — ref SConv1d._forward_non_streaming :384-418).
    `weight` may be an int8-quantized dict (k==2*stride convs only).
    """
    import math

    if isinstance(weight, dict):
        assert dilation == 1 and groups == 1
        return _causal_conv1d_q(x, weight, bias, stride)
    k = weight.shape[0]
    pad_left = causal_pad_amount(k, stride, dilation)
    t = x.shape[1]
    # right padding so every input sample lands in a complete output frame
    # (ref get_extra_padding_for_conv1d :127-133, bug-compatibly using the
    # undilated kernel size alongside the dilation-aware padding_total)
    n_frames = (t - k + pad_left) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + (k - pad_left)
    pad_right = max(ideal - t, 0)
    y = lax.conv_general_dilated(
        x,
        weight,
        window_strides=(stride,),
        padding=[(pad_left, pad_right)],
        rhs_dilation=(dilation,),
        dimension_numbers=_DIMNUMS,
        feature_group_count=groups,
        preferred_element_type=x.dtype,
    )
    if bias is not None:
        y = y + bias
    return y


class ConvState(NamedTuple):
    """Streaming state for a causal conv: the trailing `ctx` input samples."""
    buf: jnp.ndarray  # [B, ctx, Cin]


def conv_state_init(batch: int, cin: int, kernel_size: int, stride: int = 1,
                    dilation: int = 1, dtype=jnp.float32) -> ConvState:
    ctx = causal_pad_amount(kernel_size, stride, dilation)
    return ConvState(buf=jnp.zeros((batch, max(ctx, 0), cin), dtype=dtype))


def causal_conv1d_streaming(
    x: jnp.ndarray,
    state: ConvState,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    stride: int = 1,
    dilation: int = 1,
    groups: int = 1,
) -> Tuple[jnp.ndarray, ConvState]:
    """One streaming chunk; `x` is [B, T, Cin] with T a multiple of `stride`.

    Equivalent to the reference's streaming mode (ref :327-382): concat cached
    context, VALID conv, keep the trailing `ctx` inputs as next state. With a
    zero-initialized state this exactly matches `causal_conv1d` on the
    concatenated stream.
    """
    ctx = state.buf.shape[1]
    full = jnp.concatenate([state.buf, x], axis=1) if ctx > 0 else x
    if isinstance(weight, dict):
        # k == 2*stride => ctx == stride, so `full` is (F+1) whole blocks
        from ..utils.quantize import mm
        assert dilation == 1 and groups == 1 and ctx == stride
        y = mm(_conv_windows(full, stride), weight)
        if bias is not None:
            y = y + bias
        return y, ConvState(buf=full[:, full.shape[1] - ctx:, :])
    y = lax.conv_general_dilated(
        full,
        weight,
        window_strides=(stride,),
        padding=[(0, 0)],
        rhs_dilation=(dilation,),
        dimension_numbers=_DIMNUMS,
        feature_group_count=groups,
        preferred_element_type=x.dtype,
    )
    if bias is not None:
        y = y + bias
    new_buf = full[:, full.shape[1] - ctx:, :] if ctx > 0 else state.buf
    return y, ConvState(buf=new_buf)


def _convt_project(x: jnp.ndarray, weight) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """The transposed conv's dense projection: [B, T, Cin] -> [B, T, K*Cout].

    Plain weights run one einsum; int8-quantized dicts ({"qint8" [Cin,K,Cout],
    "scale" [K,Cout]}) convert in-register inside the dot (int8 HBM bytes) and
    apply the per-(tap, channel) scales to the output."""
    if isinstance(weight, dict):
        q = weight["qint8"]
        _, k, cout = q.shape
        y = jnp.einsum("btc,cko->btko", x, q.astype(x.dtype),
                       preferred_element_type=x.dtype)
        y = y * weight["scale"].astype(x.dtype)
        return y, (k, cout)
    _, k, cout = weight.shape
    return jnp.einsum("btc,cko->btko", x, weight,
                      preferred_element_type=x.dtype), (k, cout)


def causal_conv_transpose1d(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    stride: int,
) -> jnp.ndarray:
    """Causal transposed conv over [B, T, Cin] -> [B, T*stride, Cout].

    The reference computes a full ConvTranspose1d then trims `k - s` samples
    from the right (ref SConvTranspose1d :421-576, trim_right_ratio=1).  Here
    the same linear map is expressed MXU-first: one `[B*T, Cin] @ [Cin, K*Cout]`
    matmul, then overlap-add of output frames spaced `stride` apart.  Requires
    `K % stride == 0` (the model always uses K = 2*stride).
    """
    y, (k, cout) = _convt_project(x, weight)
    b, t, _ = x.shape
    assert k % stride == 0, "kernel must be a multiple of stride"
    g = k // stride  # frames each input sample touches
    # [B, T, K*Cout] -> [B, T, g, stride, Cout]
    y = y.reshape(b, t, g, stride, cout)
    # overlap-add: chunk g of input frame t lands in output frame t+g.
    out = jnp.zeros((b, t + g - 1, stride, cout), dtype=x.dtype)
    for gi in range(g):
        out = out.at[:, gi:gi + t].add(y[:, :, gi])
    # causal trim: drop the trailing (g-1) frames == k - stride samples
    out = out[:, :t].reshape(b, t * stride, cout)
    if bias is not None:
        out = out + bias
    return out


class ConvTState(NamedTuple):
    """Streaming state for a transposed conv: carried overlap partial sums.

    `tail` holds the bias-free contributions that extend past the emitted
    frames: [B, (K/stride - 1) * stride, Cout].
    """
    tail: jnp.ndarray


def conv_transpose_state_init(batch: int, cout: int, kernel_size: int,
                              stride: int, dtype=jnp.float32) -> ConvTState:
    g = kernel_size // stride
    return ConvTState(tail=jnp.zeros((batch, (g - 1) * stride, cout), dtype=dtype))


def causal_conv_transpose1d_streaming(
    x: jnp.ndarray,
    state: ConvTState,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    stride: int,
) -> Tuple[jnp.ndarray, ConvTState]:
    """One streaming chunk: [B, T, Cin] -> [B, T*stride, Cout] + new state.

    Linear overlap-add with a carried tail is mathematically identical to the
    reference's recompute-from-history streaming (ref :478-549) but does no
    redundant compute.
    """
    y, (k, cout) = _convt_project(x, weight)
    b, t, _ = x.shape
    g = k // stride
    y = y.reshape(b, t, g, stride, cout)
    acc = jnp.zeros((b, t + g - 1, stride, cout), dtype=x.dtype)
    for gi in range(g):
        acc = acc.at[:, gi:gi + t].add(y[:, :, gi])
    acc = acc.reshape(b, (t + g - 1) * stride, cout)
    # fold in carried tail from the previous chunk
    tail_len = (g - 1) * stride
    if tail_len > 0:
        acc = acc.at[:, :tail_len].add(state.tail)
        out = acc[:, : t * stride]
        new_tail = acc[:, t * stride:]
    else:
        out = acc
        new_tail = state.tail
    if bias is not None:
        out = out + bias
    return out, ConvTState(tail=new_tail)


__all__ = [
    "causal_pad_amount",
    "causal_conv1d",
    "causal_conv1d_streaming",
    "causal_conv_transpose1d",
    "causal_conv_transpose1d_streaming",
    "ConvState",
    "ConvTState",
    "conv_state_init",
    "conv_transpose_state_init",
]
