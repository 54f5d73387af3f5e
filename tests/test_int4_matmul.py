"""int4 dequant-matmul kernel: exactness vs the dequantized model (interpret
mode on CPU; the same kernel compiles via Mosaic on TPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vibevoice_tpu.ops.int4_matmul import (
    quantize_int4, int4_matmul, dequant_int4_xla, pack_int4)


def _dequant_host(qd, k):
    packed = np.asarray(qd["qint4"]).view(np.uint8).astype(np.int32)
    lo = ((packed & 0xF) ^ 8) - 8
    hi = ((packed >> 4) ^ 8) - 8
    w = np.empty((k, packed.shape[1]), np.float32)
    w[0::2], w[1::2] = lo, hi
    s = np.asarray(qd["scale4"], np.float32)
    g = s.shape[0]
    if g == 1:
        return w * s
    return (w.reshape(g, k // g, -1) * s[:, None]).reshape(k, -1)


@pytest.mark.parametrize("group_size", [None, 64])
@pytest.mark.parametrize("k,n,n_blk", [(256, 384, 128), (512, 300, 128)])
def test_kernel_matches_dequant_model(group_size, k, n, n_blk):
    """Kernel output == x @ dequantized(w) exactly (fp32 x, incl. a
    non-divisible N exercising the partial final block)."""
    rng = np.random.default_rng(0)
    w = rng.normal(0, 0.02, (k, n)).astype(np.float32)
    x = jnp.asarray(rng.normal(0, 1, (2, k)), jnp.float32)
    qd = quantize_int4(w, group_size=group_size)
    got = np.asarray(int4_matmul(x, qd["qint4"], qd["scale4"],
                                 n_blk=n_blk, interpret=True), np.float32)
    ref = np.asarray(x, np.float32) @ _dequant_host(qd, k)
    # per-channel scales hit the fp32 accumulator (exact); group scales are
    # multiplied into the bf16 weights before the MXU (bf16 rounding)
    tol = dict(rtol=2e-4, atol=2e-5) if group_size is None else dict(rtol=1e-2, atol=6e-3)
    np.testing.assert_allclose(got, ref, **tol)


def test_quant_error_reasonable():
    """int4 per-channel quantization error stays bounded on gaussian weights."""
    rng = np.random.default_rng(1)
    k, n = 512, 256
    w = rng.normal(0, 0.02, (k, n)).astype(np.float32)
    qd = quantize_int4(w, group_size=64)
    werr = np.abs(_dequant_host(qd, k) - w).max() / np.abs(w).max()
    assert werr < 0.1  # half an int4 quantum of the per-group range


def test_xla_dequant_matches_host():
    rng = np.random.default_rng(2)
    k, n = 128, 256
    w = rng.normal(0, 0.02, (k, n)).astype(np.float32)
    for gs in (None, 32):
        qd = quantize_int4(w, group_size=gs)
        got = np.asarray(dequant_int4_xla(qd["qint4"], qd["scale4"], jnp.float32))
        np.testing.assert_allclose(got, _dequant_host(qd, k), rtol=1e-6, atol=1e-7)


def test_pack_roundtrip_order():
    """pack_int4 row order matches the bitcast expansion (row 2i = low nibble)."""
    q = np.arange(-8, 8).repeat(4).reshape(16, 4)[:8]  # arbitrary int4 values
    q = np.clip(q, -8, 7)
    packed = np.asarray(pack_int4(q))
    u = packed.view(np.uint8).astype(np.int32)
    lo = ((u & 0xF) ^ 8) - 8
    hi = ((u >> 4) ^ 8) - 8
    np.testing.assert_array_equal(lo, q[0::2])
    np.testing.assert_array_equal(hi, q[1::2])
