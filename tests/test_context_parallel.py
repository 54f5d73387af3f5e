"""Context-parallel prefill attention on the 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp

from vibevoice_tpu.parallel import context_parallel as cp
from vibevoice_tpu.parallel.mesh import make_mesh


def naive(q, k, v, pad_mask):
    b, t, h, d = q.shape
    g = h // k.shape[2]
    kr = jnp.repeat(k, g, axis=2)
    vr = jnp.repeat(v, g, axis=2)
    logits = jnp.einsum("bthd,bshd->bhts", q, kr) / np.sqrt(d)
    mask = jnp.tril(jnp.ones((t, t), bool))[None, None] & \
        pad_mask[:, None, None, :].astype(bool)
    p = jax.nn.softmax(jnp.where(mask, logits, -1e30), axis=-1)
    return jnp.einsum("bhts,bshd->bthd", p, vr)


def test_cp_prefill_matches_naive():
    mesh = make_mesh(data=8, model=1)
    b, t, h, kvh, d = 2, 64, 4, 2, 32
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, t, h, d)) * 0.3
    k = jax.random.normal(kk, (b, t, kvh, d)) * 0.3
    v = jax.random.normal(kv, (b, t, kvh, d)) * 0.3
    pad = jnp.ones((b, t), jnp.int32).at[0, :5].set(0)

    out = cp.cp_prefill_attention(q, k, v, pad, mesh, axis="data", use_flash=False)
    ref = naive(q, k, v, pad)
    np.testing.assert_allclose(np.asarray(out[0, 5:]), np.asarray(ref[0, 5:]),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref[1]),
                               atol=2e-5, rtol=1e-4)


def test_ring_prefill_matches_naive():
    from vibevoice_tpu.parallel.ring_attention import ring_prefill_attention
    mesh = make_mesh(data=8, model=1)
    b, t, h, kvh, d = 2, 64, 4, 2, 32
    key = jax.random.PRNGKey(1)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, t, h, d)) * 0.3
    k = jax.random.normal(kk, (b, t, kvh, d)) * 0.3
    v = jax.random.normal(kv, (b, t, kvh, d)) * 0.3
    pad = jnp.ones((b, t), jnp.int32).at[1, :9].set(0)

    out = ring_prefill_attention(q, k, v, pad, mesh, axis="data")
    ref = naive(q, k, v, pad)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out[1, 9:]), np.asarray(ref[1, 9:]),
                               atol=2e-5, rtol=1e-4)
