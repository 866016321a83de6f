"""VAE first-stage tests: golden parity of Decoder/Encoder vs the torch
reference (ldm/modules/diffusionmodules/model.py) and the VQ nearest-
codebook lookup."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfmq_dm_tpu.models import vae

REF = "/root/reference/stable-diffusion"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_decoder_golden_parity():
    import torch
    sys.path.insert(0, REF)
    from ldm.modules.diffusionmodules.model import Decoder

    cfg = vae.tiny_vae_config()
    torch.manual_seed(0)
    tm = Decoder(ch=cfg.ch, out_ch=cfg.out_ch, ch_mult=list(cfg.ch_mult),
                 num_res_blocks=cfg.num_res_blocks,
                 attn_resolutions=list(cfg.attn_resolutions), dropout=0.0,
                 in_channels=cfg.in_channels, resolution=cfg.resolution,
                 z_channels=cfg.z_channels).eval()
    sd = {f"decoder.{k}": v for k, v in tm.state_dict().items()}
    from tfmq_dm_tpu.utils.torch_convert import convert_state_dict
    params = convert_state_dict(sd, vae.iter_decoder_layers(cfg))
    rng = np.random.RandomState(0)
    z = rng.randn(2, cfg.z_channels, 8, 8).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(z)).numpy()
    got = vae.decoder_apply(params, cfg, jnp.asarray(z.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref,
                               atol=1e-3, rtol=1e-3)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_encoder_golden_parity():
    import torch
    sys.path.insert(0, REF)
    from ldm.modules.diffusionmodules.model import Encoder

    cfg = vae.tiny_vae_config(double_z=True)
    torch.manual_seed(1)
    tm = Encoder(ch=cfg.ch, out_ch=cfg.out_ch, ch_mult=list(cfg.ch_mult),
                 num_res_blocks=cfg.num_res_blocks,
                 attn_resolutions=list(cfg.attn_resolutions), dropout=0.0,
                 in_channels=cfg.in_channels, resolution=cfg.resolution,
                 z_channels=cfg.z_channels, double_z=True).eval()
    sd = {f"encoder.{k}": v for k, v in tm.state_dict().items()}
    from tfmq_dm_tpu.utils.torch_convert import convert_state_dict
    params = convert_state_dict(sd, vae.iter_encoder_layers(cfg))
    rng = np.random.RandomState(2)
    x = rng.randn(2, cfg.in_channels, cfg.resolution,
                  cfg.resolution).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    got = vae.encoder_apply(params, cfg,
                            jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref,
                               atol=1e-3, rtol=1e-3)


def test_vq_lookup_snaps_to_codebook():
    cfg = vae.tiny_vae_config()
    params = vae.init_params(jax.random.PRNGKey(0), cfg, encoder=False)
    emb = np.asarray(params["quantize.embedding"]["w"])
    z = jnp.asarray(emb[5].reshape(1, 1, 1, -1) + 1e-4)
    out = vae.vq_lookup(params, z)
    np.testing.assert_allclose(np.asarray(out).reshape(-1), emb[5],
                               atol=1e-6)


def test_decode_runs_and_shapes():
    cfg = vae.tiny_vae_config()
    params = vae.init_params(jax.random.PRNGKey(1), cfg, encoder=False)
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, cfg.embed_dim))
    img = jax.jit(lambda z: vae.decode(params, cfg, z))(z)
    assert img.shape == (2, 16, 16, 3)
    assert bool(jnp.all(jnp.isfinite(img)))
