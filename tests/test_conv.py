"""Parity tests: causal conv primitives vs torch reference SConv1d/SConvTranspose1d."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vibevoice_tpu.ops.conv import (
    causal_conv1d,
    causal_conv1d_streaming,
    causal_conv_transpose1d,
    causal_conv_transpose1d_streaming,
    conv_state_init,
    conv_transpose_state_init,
)

torch = pytest.importorskip("torch")


def _ref_sconv(reference_path, **kw):
    from vibevoice.modular.modular_vibevoice_tokenizer import SConv1d
    return SConv1d(**kw)


def _ref_sconvt(reference_path, **kw):
    from vibevoice.modular.modular_vibevoice_tokenizer import SConvTranspose1d
    return SConvTranspose1d(**kw)


@pytest.mark.parametrize("cin,cout,k,stride,t", [
    (3, 5, 7, 1, 64),
    (4, 8, 8, 4, 64),
    (2, 6, 4, 2, 32),
    (5, 5, 10, 5, 50),
])
def test_causal_conv1d_matches_reference(reference_path, cin, cout, k, stride, t):
    torch.manual_seed(0)
    m = _ref_sconv(reference_path, in_channels=cin, out_channels=cout,
                   kernel_size=k, stride=stride, causal=True, pad_mode="constant")
    x = torch.randn(2, cin, t)
    with torch.no_grad():
        y_ref = m(x).numpy()

    w = jnp.asarray(m.conv.conv.weight.detach().numpy().transpose(2, 1, 0))
    b = jnp.asarray(m.conv.conv.bias.detach().numpy())
    y = causal_conv1d(jnp.asarray(x.numpy().transpose(0, 2, 1)), w, b, stride=stride)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), y_ref, atol=1e-5)


def test_causal_conv1d_depthwise(reference_path):
    torch.manual_seed(1)
    dim, t = 6, 40
    m = _ref_sconv(reference_path, in_channels=dim, out_channels=dim,
                   kernel_size=7, stride=1, groups=dim, causal=True, pad_mode="constant")
    x = torch.randn(2, dim, t)
    with torch.no_grad():
        y_ref = m(x).numpy()
    w = jnp.asarray(m.conv.conv.weight.detach().numpy().transpose(2, 1, 0))
    b = jnp.asarray(m.conv.conv.bias.detach().numpy())
    y = causal_conv1d(jnp.asarray(x.numpy().transpose(0, 2, 1)), w, b, groups=dim)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), y_ref, atol=1e-5)


@pytest.mark.parametrize("cin,cout,stride", [(4, 8, 2), (6, 3, 5), (8, 4, 8)])
def test_causal_conv_transpose1d_matches_reference(reference_path, cin, cout, stride):
    torch.manual_seed(2)
    k = 2 * stride
    t = 12
    m = _ref_sconvt(reference_path, in_channels=cin, out_channels=cout,
                    kernel_size=k, stride=stride, causal=True)
    x = torch.randn(2, cin, t)
    with torch.no_grad():
        y_ref = m(x).numpy()
    w = jnp.asarray(m.convtr.convtr.weight.detach().numpy().transpose(0, 2, 1))
    b = jnp.asarray(m.convtr.convtr.bias.detach().numpy())
    y = causal_conv_transpose1d(jnp.asarray(x.numpy().transpose(0, 2, 1)), w, b, stride=stride)
    assert y.shape == (2, t * stride, cout)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), y_ref, atol=1e-5)


@pytest.mark.parametrize("stride,chunk", [(1, 4), (2, 2), (4, 4)])
def test_conv_streaming_equals_full(stride, chunk):
    key = jax.random.PRNGKey(0)
    cin, cout, k, t = 3, 5, (7 if stride == 1 else 2 * stride), 32
    kw, kb, kx = jax.random.split(key, 3)
    w = jax.random.normal(kw, (k, cin, cout))
    b = jax.random.normal(kb, (cout,))
    x = jax.random.normal(kx, (2, t, cin))

    y_full = causal_conv1d(x, w, b, stride=stride)
    st = conv_state_init(2, cin, k, stride)
    outs = []
    for i in range(0, t, chunk):
        y, st = causal_conv1d_streaming(x[:, i:i + chunk], st, w, b, stride=stride)
        outs.append(y)
    y_stream = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(y_stream), np.asarray(y_full), atol=1e-5)


@pytest.mark.parametrize("stride,chunk", [(2, 1), (4, 2), (5, 3)])
def test_conv_transpose_streaming_equals_full(stride, chunk):
    key = jax.random.PRNGKey(1)
    cin, cout, t = 4, 3, 12
    k = 2 * stride
    kw, kb, kx = jax.random.split(key, 3)
    w = jax.random.normal(kw, (cin, k, cout))
    b = jax.random.normal(kb, (cout,))
    x = jax.random.normal(kx, (2, t, cin))

    y_full = causal_conv_transpose1d(x, w, b, stride=stride)
    st = conv_transpose_state_init(2, cout, k, stride)
    outs = []
    for i in range(0, t, chunk):
        y, st = causal_conv_transpose1d_streaming(x[:, i:i + chunk], st, w, b, stride=stride)
        outs.append(y)
    y_stream = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(y_stream), np.asarray(y_full), atol=1e-5)
