"""Parity: adaLN diffusion head vs the torch reference."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vibevoice_tpu.configs import DiffusionHeadConfig
from vibevoice_tpu.models import diffusion_head as dh
from vibevoice_tpu.utils import torch_bridge as tb

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_head(reference_path):
    from vibevoice.modular.configuration_vibevoice import VibeVoiceDiffusionHeadConfig
    from vibevoice.modular.modular_vibevoice_diffusion_head import VibeVoiceDiffusionHead
    cfg = VibeVoiceDiffusionHeadConfig(
        hidden_size=64, latent_size=8, head_layers=2, head_ffn_ratio=3.0, rms_norm_eps=1e-5,
    )
    torch.manual_seed(0)
    m = VibeVoiceDiffusionHead(cfg)
    # zero-init adaLN/final makes the net trivially linear; randomize for a real test
    with torch.no_grad():
        for l in m.layers:
            l.adaLN_modulation[1].weight.normal_(0, 0.02)
        m.final_layer.adaLN_modulation[1].weight.normal_(0, 0.02)
        m.final_layer.linear.weight.normal_(0, 0.02)
    m.eval()
    return m


def test_head_parity(ref_head):
    cfg = DiffusionHeadConfig(hidden_size=64, latent_size=8, head_layers=2)
    params = tb.diffusion_head_from_torch(ref_head)
    torch.manual_seed(1)
    noisy = torch.randn(5, 8)
    t = torch.randint(0, 1000, (5,)).float()
    cond = torch.randn(5, 64)
    with torch.no_grad():
        out_ref = ref_head(noisy, t, cond).numpy()
    out = dh.apply(params, cfg, jnp.asarray(noisy.numpy()), jnp.asarray(t.numpy()),
                   jnp.asarray(cond.numpy()))
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=2e-5)


def test_timestep_embedding_parity(ref_head):
    from vibevoice.modular.modular_vibevoice_diffusion_head import TimestepEmbedder
    t = torch.tensor([0.0, 1.0, 17.0, 999.0])
    ref = TimestepEmbedder.timestep_embedding(t, 256).numpy()
    ours = dh.timestep_embedding(jnp.asarray(t.numpy()), 256)
    # fp32 trig range reduction differs in ULPs between torch and XLA at large t
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


def test_zero_init_matches_reference_init(ref_head):
    cfg = DiffusionHeadConfig(hidden_size=64, latent_size=8, head_layers=2)
    params = dh.init(jax.random.PRNGKey(0), cfg)
    for lp in params["layers"]:
        assert float(jnp.abs(lp["ada_w"]).sum()) == 0.0
    assert float(jnp.abs(params["final_ada_w"]).sum()) == 0.0
    assert float(jnp.abs(params["final_linear"]).sum()) == 0.0
