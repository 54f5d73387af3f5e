"""Parity: native Qwen2 decoder vs transformers Qwen2Model (CPU, fp32, SDPA)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vibevoice_tpu.configs import Qwen2Config
from vibevoice_tpu.models import qwen2 as q
from vibevoice_tpu.utils import torch_bridge as tb

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

CFG = Qwen2Config(
    vocab_size=128, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=256, rope_theta=1e6,
)


@pytest.fixture(scope="module")
def ref_model():
    from transformers.models.qwen2 import Qwen2Config as HFConfig, Qwen2Model
    hf_cfg = HFConfig(
        vocab_size=CFG.vocab_size, hidden_size=CFG.hidden_size,
        intermediate_size=CFG.intermediate_size, num_hidden_layers=CFG.num_hidden_layers,
        num_attention_heads=CFG.num_attention_heads, num_key_value_heads=CFG.num_key_value_heads,
        max_position_embeddings=CFG.max_position_embeddings, rope_theta=CFG.rope_theta,
        rms_norm_eps=CFG.rms_norm_eps, attn_implementation="sdpa",
    )
    torch.manual_seed(0)
    m = Qwen2Model(hf_cfg)
    m.eval()
    return m


def test_forward_parity_full_sequence(ref_model):
    params = tb.qwen2_from_torch(ref_model)
    torch.manual_seed(1)
    ids = torch.randint(0, CFG.vocab_size, (2, 16))
    with torch.no_grad():
        out_ref = ref_model(input_ids=ids).last_hidden_state.numpy()

    embeds = jnp.asarray(params["embed"])[jnp.asarray(ids.numpy())]
    mask = jnp.ones((2, 16), jnp.int32)
    pos = q.positions_from_mask(mask)
    bias = q.causal_bias(mask, 16)
    hidden, _ = q.forward(params, CFG, embeds, pos, bias)
    np.testing.assert_allclose(np.asarray(hidden), out_ref, atol=3e-5)


def test_forward_parity_left_padded(ref_model):
    params = tb.qwen2_from_torch(ref_model)
    torch.manual_seed(2)
    ids = torch.randint(0, CFG.vocab_size, (2, 12))
    att = torch.ones(2, 12, dtype=torch.long)
    att[0, :5] = 0  # left padding on sample 0
    pos_t = att.cumsum(-1) - 1
    pos_t = pos_t.clamp(min=0)
    with torch.no_grad():
        out_ref = ref_model(input_ids=ids, attention_mask=att, position_ids=pos_t).last_hidden_state.numpy()

    embeds = jnp.asarray(params["embed"])[jnp.asarray(ids.numpy())]
    mask = jnp.asarray(att.numpy())
    hidden, _ = q.forward(params, CFG, embeds, q.positions_from_mask(mask),
                          q.causal_bias(mask, 12))
    # compare only unpadded positions
    np.testing.assert_allclose(np.asarray(hidden)[0, 5:], out_ref[0, 5:], atol=3e-5)
    np.testing.assert_allclose(np.asarray(hidden)[1], out_ref[1], atol=3e-5)


def test_kv_cached_decode_equals_full():
    """Prefill + step-by-step cached decode == one full forward."""
    params = q.init(jax.random.PRNGKey(0), CFG)
    key = jax.random.PRNGKey(1)
    b, t_pre, t_dec, s_max = 2, 8, 4, 32
    embeds = jax.random.normal(key, (b, t_pre + t_dec, CFG.hidden_size)) * 0.1

    mask_full = jnp.ones((b, t_pre + t_dec), jnp.int32)
    full, _ = q.forward(params, CFG, embeds, q.positions_from_mask(mask_full),
                        q.causal_bias(mask_full, t_pre + t_dec))

    cache = q.kv_cache_init(CFG, b, s_max)
    visible = jnp.zeros((b, s_max), jnp.int32).at[:, :t_pre].set(1)
    pos = q.positions_from_mask(jnp.ones((b, t_pre), jnp.int32))
    bias = q.causal_bias(jnp.ones((b, t_pre), jnp.int32), t_pre)
    # prefill writes into cache positions [0, t_pre)
    pre_bias = jnp.full((b, 1, t_pre, s_max), -1e9, jnp.float32)
    pre_bias = pre_bias.at[:, :, :, :t_pre].set(bias)
    h_pre, cache = q.forward(params, CFG, embeds[:, :t_pre], pos, pre_bias,
                             cache=cache, write_pos=jnp.int32(0))
    np.testing.assert_allclose(np.asarray(h_pre), np.asarray(full[:, :t_pre]), atol=1e-5)

    for i in range(t_dec):
        wp = t_pre + i
        visible = visible.at[:, wp].set(1)
        step_pos = jnp.full((b, 1), wp, jnp.int32)
        h_i, cache = q.forward(params, CFG, embeds[:, wp:wp + 1], step_pos,
                               q.decode_bias(visible), cache=cache, write_pos=jnp.int32(wp))
        np.testing.assert_allclose(np.asarray(h_i[:, 0]), np.asarray(full[:, wp]), atol=1e-5)


def test_tied_logits():
    params = q.init(jax.random.PRNGKey(0), CFG)
    h = jax.random.normal(jax.random.PRNGKey(2), (2, 3, CFG.hidden_size))
    lg = q.logits(params, CFG, h)
    assert lg.shape == (2, 3, CFG.vocab_size)
