"""Flash-attention kernel vs naive reference attention (interpret mode on CPU)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vibevoice_tpu.ops import flash_attention as fa


def naive_attention(q, k, v, pad_mask, causal=True):
    b, t, h, d = q.shape
    kvh = k.shape[2]
    g = h // kvh
    kr = jnp.repeat(k, g, axis=2)
    vr = jnp.repeat(v, g, axis=2)
    logits = jnp.einsum("bthd,bshd->bhts", q, kr) / np.sqrt(d)
    mask = pad_mask[:, None, None, :].astype(bool)
    if causal:
        s = k.shape[1]
        causal_m = jnp.tril(jnp.ones((t, s), bool), k=s - t)
        mask = mask & causal_m[None, None]
    logits = jnp.where(mask, logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhts,bshd->bthd", probs, vr)


@pytest.mark.parametrize("t,h,kvh,pad", [(256, 4, 2, 0), (256, 4, 4, 37), (384, 8, 2, 100)])
def test_flash_matches_naive(t, h, kvh, pad, monkeypatch):
    # interpret mode: run the pallas kernel on CPU
    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp)
    monkeypatch.setattr(fa.pl, "pallas_call", interp)

    d = 64
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (2, t, h, d), jnp.float32) * 0.3
    k = jax.random.normal(kk, (2, t, kvh, d), jnp.float32) * 0.3
    v = jax.random.normal(kv, (2, t, kvh, d), jnp.float32) * 0.3
    pad_mask = jnp.ones((2, t), jnp.int32)
    if pad:
        pad_mask = pad_mask.at[0, :pad].set(0)  # left padding on sample 0

    out = fa.flash_attention_prefill(q, k, v, pad_mask, block_q=128, block_k=128)
    ref = naive_attention(q, k, v, pad_mask)

    # compare only valid (unpadded) query rows
    np.testing.assert_allclose(np.asarray(out[0, pad:]), np.asarray(ref[0, pad:]),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref[1]),
                               atol=2e-5, rtol=1e-4)
