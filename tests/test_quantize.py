"""Weight-only int8: mm dispatch, round-trip accuracy, LM output closeness."""
import numpy as np
import jax
import jax.numpy as jnp

from vibevoice_tpu.configs import Qwen2Config
from vibevoice_tpu.models import qwen2 as q
from vibevoice_tpu.utils import quantize as qz

CFG = Qwen2Config(vocab_size=128, hidden_size=64, intermediate_size=128,
                  num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
                  max_position_embeddings=256)


def test_quantize_roundtrip_error():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 128)) * 0.05
    qd = qz.quantize_weight(w)
    deq = qd["qint8"].astype(jnp.float32) * qd["scale"].astype(jnp.float32)
    rel = float(jnp.abs(deq - w).max() / jnp.abs(w).max())
    assert rel < 0.01  # per-channel int8: <1% of channel max


def test_mm_dispatch():
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 64))
    w = jax.random.normal(jax.random.PRNGKey(2), (64, 32)) * 0.1
    plain = qz.mm(x, w)
    quant = qz.mm(x, qz.quantize_weight(w))
    np.testing.assert_allclose(np.asarray(plain), np.asarray(quant), atol=2e-2, rtol=0.1)


def test_quantized_lm_close_to_fp():
    params = q.init(jax.random.PRNGKey(0), CFG)
    qlm = qz.quantize_lm(params["lm"] if "lm" in params else params)
    ids = jax.random.randint(jax.random.PRNGKey(3), (1, 12), 0, CFG.vocab_size)
    embeds = params["embed"][ids]
    mask = jnp.ones((1, 12), jnp.int32)
    pos = q.positions_from_mask(mask)
    bias = q.causal_bias(mask, 12)
    h_fp, _ = q.forward(params, CFG, embeds, pos, bias)
    h_q, _ = q.forward(qlm, CFG, embeds, pos, bias)
    # int8 noise grows through depth; outputs should stay well-correlated
    corr = float(jnp.corrcoef(h_fp.reshape(-1), h_q.reshape(-1))[0, 1])
    assert corr > 0.99
