"""Decode-attention kernel vs naive masked attention (interpret mode)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vibevoice_tpu.ops import decode_attention as da


def naive(q, k, v, visible):
    b, h, d = q.shape
    kvh = k.shape[2]
    g = h // kvh
    kr = jnp.repeat(k, g, axis=2)
    vr = jnp.repeat(v, g, axis=2)
    logits = jnp.einsum("bhd,bshd->bhs", q, kr) / np.sqrt(d)
    logits = jnp.where(visible[:, None, :] > 0, logits, -1e30)
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhs,bshd->bhd", p, vr)


@pytest.mark.parametrize("s,h,kvh,block", [(512, 8, 2, 128), (384, 4, 4, 128)])
def test_decode_attention_matches_naive(s, h, kvh, block, monkeypatch):
    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(da.pl, "pallas_call", interp)

    d = 64
    key = jax.random.PRNGKey(0)
    kq, kk, kv2 = jax.random.split(key, 3)
    b, n_layers, layer = 2, 3, 1
    q = jax.random.normal(kq, (b, h, d)) * 0.3
    # full stacked cache [L, B, S, KVH*D]; the kernel reads `layer` directly
    k_full = jax.random.normal(kk, (n_layers, b, s, kvh * d)) * 0.3
    v_full = jax.random.normal(kv2, (n_layers, b, s, kvh * d)) * 0.3
    # sparse visibility with per-sample prefix lengths (like the CFG stream)
    lengths = jnp.array([s // 2, s - 10], jnp.int32)
    vis = (jnp.arange(s)[None, :] < lengths[:, None]).astype(jnp.int32)
    vis = vis.at[0, 5].set(0)  # hole, like a reset stream

    out = da.decode_attention(q, k_full, v_full, layer, vis, lengths, block_k=block)
    ref = naive(q, k_full[layer].reshape(b, s, kvh, d),
                v_full[layer].reshape(b, s, kvh, d), vis)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_decode_attention_int8_kv(monkeypatch):
    """int8-quantized cache + per-slot scales, dequantized in-kernel."""
    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(da.pl, "pallas_call", interp)

    s, h, kvh, d, b, layer = 512, 8, 2, 64, 2, 1
    key = jax.random.PRNGKey(1)
    kq, kk, kv2 = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, d)) * 0.3
    k_fp = jax.random.normal(kk, (3, b, s, kvh * d)) * 0.3
    v_fp = jax.random.normal(kv2, (3, b, s, kvh * d)) * 0.3

    # quantize per slot (same scheme as qwen2._quantize_slots)
    def quant(x):
        amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        scale = amax / 127.0
        qv = jnp.clip(jnp.round(x / jnp.maximum(scale, 1e-12)), -127, 127).astype(jnp.int8)
        sc = jnp.broadcast_to(scale[..., 0][:, :, None, :], (3, b, 8, s)).astype(jnp.bfloat16)
        return qv, sc

    k_q, k_sc = quant(k_fp)
    v_q, v_sc = quant(v_fp)

    lengths = jnp.array([s // 2, s - 10], jnp.int32)
    vis = (jnp.arange(s)[None, :] < lengths[:, None]).astype(jnp.int32)

    out = da.decode_attention(q, k_q, v_q, layer, vis, lengths, block_k=128,
                              k_scale=k_sc, v_scale=v_sc)
    # reference: dequantized cache through the naive path
    k_dq = (k_q[layer].astype(jnp.float32) * k_sc[layer, :, 0].astype(jnp.float32)[..., None]).reshape(b, s, kvh, d)
    v_dq = (v_q[layer].astype(jnp.float32) * v_sc[layer, :, 0].astype(jnp.float32)[..., None]).reshape(b, s, kvh, d)
    ref = naive(q, k_dq, v_dq, vis)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-3, rtol=1e-2)
    # and close to the unquantized attention (int8 noise only)
    ref_fp = naive(q, k_fp[layer].reshape(b, s, kvh, d), v_fp[layer].reshape(b, s, kvh, d), vis)
    corr = float(jnp.corrcoef(jnp.asarray(out).reshape(-1), ref_fp.reshape(-1))[0, 1])
    assert corr > 0.999
