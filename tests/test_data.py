"""Training data pipeline -> TrainBatch -> one training step (end to end)."""
import numpy as np
import jax
import jax.numpy as jnp
import optax

from vibevoice_tpu import data as D
from vibevoice_tpu import train as T
from vibevoice_tpu.configs import tiny_config
from vibevoice_tpu.models import tokenizer as tok, vibevoice
from vibevoice_tpu.processor.text_tokenizer import ByteFallbackTokenizer


def test_build_batch_shapes_and_masks():
    tk = ByteFallbackTokenizer()
    hop = 16
    rng = np.random.default_rng(0)
    examples = [
        ([(1, " Hello there."), (2, " Hi.")],
         [rng.normal(0, 0.1, 40), rng.normal(0, 0.1, 16)]),
        ([(1, " Short.")], [rng.normal(0, 0.1, 20)]),
    ]
    batch = D.build_training_batch(tk, examples, hop=hop, semantic_dim=16)
    b, t = batch.input_ids.shape
    assert b == 2 and t % 64 == 0
    # frame counts: ceil(40/16)=3, ceil(16/16)=1, ceil(20/16)=2
    assert batch.speech_masks.sum() == 6
    assert batch.acoustic_input_mask.sum() == 6
    # loss mask is input mask shifted left
    np.testing.assert_array_equal(batch.acoustic_loss_mask[:, :-1],
                                  batch.acoustic_input_mask[:, 1:])
    # label of the position before each frame is the diffusion token
    for i in range(b):
        pos = np.nonzero(batch.acoustic_input_mask[i])[0]
        assert (batch.labels[i, pos - 1] == tk.speech_diffusion_id).all()


def test_batch_trains():
    cfg = tiny_config(vocab_size=320)
    tk = ByteFallbackTokenizer()
    hop = cfg.speech_compress_ratio
    rng = np.random.default_rng(1)
    params = vibevoice.init_model(jax.random.PRNGKey(0), cfg)
    params["speech_scaling_factor"] = jnp.asarray(1.0)
    params["speech_bias_factor"] = jnp.asarray(0.0)

    def semantic_fn(speech):
        lat = tok.encoder_apply(params["semantic_encoder"], cfg.semantic_tokenizer,
                                jnp.asarray(speech)[..., None])
        return np.asarray(lat)

    examples = [([(1, " A test.")], [rng.normal(0, 0.1, 2 * hop)])]
    batch = D.build_training_batch(tk, examples, hop=hop, semantic_fn=semantic_fn,
                                   semantic_dim=cfg.semantic_vae_dim,
                                   pad_to_multiple=32)
    assert batch.speech_semantic_tensors.shape[-1] == cfg.semantic_vae_dim

    opt = optax.adam(1e-3)
    step = T.make_train_step(cfg, opt)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    opt_state = opt.init(params)
    params2, opt_state, metrics = jax.jit(step)(params, opt_state, batch,
                                                jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["ce_loss"]) > 0
