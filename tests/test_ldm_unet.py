"""LDM/SD UNet tests: shape sanity + golden numerical parity against the
reference torch UNetModel (openaimodel.py:446-780), for both the
AttentionBlock family (LDM) and the SpatialTransformer family (SD),
plus class-conditional. Skipped when /root/reference is absent."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfmq_dm_tpu.models import ldm_unet

REF = "/root/reference/stable-diffusion"
pytorch_available = os.path.isdir(REF)


def _torch_unet(cfg: ldm_unet.LDMUNetConfig):
    import torch
    sys.path.insert(0, REF)
    # the reference imports omegaconf only to typecheck context_dim;
    # stub it (not installed, and we must not install anything)
    import types
    if "omegaconf" not in sys.modules:
        om = types.ModuleType("omegaconf")
        lc = types.ModuleType("omegaconf.listconfig")

        class ListConfig:  # noqa: N801
            pass

        lc.ListConfig = ListConfig
        om.listconfig = lc
        sys.modules["omegaconf"] = om
        sys.modules["omegaconf.listconfig"] = lc
    from ldm.modules.diffusionmodules.openaimodel import UNetModel
    torch.manual_seed(0)
    m = UNetModel(
        image_size=cfg.image_size, in_channels=cfg.in_channels,
        model_channels=cfg.model_channels, out_channels=cfg.out_channels,
        num_res_blocks=cfg.num_res_blocks,
        attention_resolutions=list(cfg.attention_resolutions),
        channel_mult=list(cfg.channel_mult),
        num_classes=cfg.num_classes, num_heads=cfg.num_heads,
        num_head_channels=cfg.num_head_channels,
        use_scale_shift_norm=cfg.use_scale_shift_norm,
        resblock_updown=cfg.resblock_updown,
        use_spatial_transformer=cfg.use_spatial_transformer,
        transformer_depth=cfg.transformer_depth,
        context_dim=cfg.context_dim, legacy=cfg.legacy)
    return m.eval()


def test_forward_shapes_ldm():
    cfg = ldm_unet.tiny_ldm_config()
    params = ldm_unet.init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((2, cfg.image_size, cfg.image_size, cfg.in_channels))
    t = jnp.array([1, 500], jnp.int32)
    out = jax.jit(lambda p, x, t: ldm_unet.apply(p, cfg, x, t))(params, x, t)
    assert out.shape == (2, cfg.image_size, cfg.image_size,
                         cfg.out_channels)


def test_layer_info_order():
    cfg = ldm_unet.tiny_sd_config()
    infos = ldm_unet.layer_infos(cfg)
    names = [i.name for i in infos if i.kind != "act"]
    assert names[0] == "time_embed.0"
    assert names[1] == "time_embed.2"
    assert names[2] == "input_blocks.0.0"
    assert names[3] == "input_blocks.1.0.in_layers.2"
    assert names[-1] == "out.2"
    assert not any("skip" in n or ".op" in n for n in names)
    params = ldm_unet.init_params(jax.random.PRNGKey(0), cfg)
    for n in names:
        assert n in params, n


@pytest.mark.skipif(not pytorch_available, reason="reference not mounted")
@pytest.mark.parametrize("family", ["ldm", "sd", "class_cond", "ssn",
                                    "churches"])
def test_golden_parity(family):
    import torch
    if family == "ldm":
        cfg = ldm_unet.tiny_ldm_config()
    elif family == "sd":
        cfg = ldm_unet.tiny_sd_config()
    elif family == "class_cond":
        cfg = ldm_unet.tiny_ldm_config(num_classes=10)
    elif family == "churches":
        # LSUN-churches style: resblock up/down + scale-shift norm
        cfg = ldm_unet.tiny_ldm_config(use_scale_shift_norm=True,
                                       resblock_updown=True,
                                       attention_resolutions=(1, 2))
    else:
        cfg = ldm_unet.tiny_ldm_config(use_scale_shift_norm=True)
    tm = _torch_unet(cfg)
    from tfmq_dm_tpu.utils.torch_convert import convert_state_dict
    params = convert_state_dict(tm.state_dict(),
                                ldm_unet.iter_layers(cfg))
    rng = np.random.RandomState(0)
    x = rng.randn(2, cfg.in_channels, cfg.image_size,
                  cfg.image_size).astype(np.float32)
    t = np.array([3, 777], dtype=np.int64)
    kwargs_t, kwargs_j = {}, {}
    if cfg.use_spatial_transformer:
        c = rng.randn(2, 5, cfg.context_dim).astype(np.float32)
        kwargs_t["context"] = torch.from_numpy(c)
        kwargs_j["context"] = jnp.asarray(c)
    if cfg.num_classes is not None:
        yv = np.array([1, 7], dtype=np.int64)
        kwargs_t["y"] = torch.from_numpy(yv)
        kwargs_j["y"] = jnp.asarray(yv)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(t),
                 **kwargs_t).numpy()
    ours = ldm_unet.apply(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)),
                          jnp.asarray(t), **kwargs_j)
    ours = np.asarray(ours).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-3)


@pytest.mark.slow
@pytest.mark.skipif(not pytorch_available, reason="reference not mounted")
@pytest.mark.parametrize("which", ["celeba256", "sd_v1"])
def test_golden_parity_fullsize(which):
    """Real-scale config transcription check (VERDICT r2 missing #4):
    the tiny-config parity tests can't catch slips in the
    attention_resolutions ds mapping, legacy head-dim logic
    (openaimodel.py:500-520, 575-583) or channel mults that only
    manifest at real widths — so build the REAL celeba256 (LDM-4,
    model_channels 224, ~274M params) and SD v1 (320, ~860M) torch
    UNets, convert their state dicts, and assert forward parity."""
    import torch
    torch.set_num_threads(1)
    cfg = (ldm_unet.celeba_config() if which == "celeba256"
           else ldm_unet.sd_v1_config())
    tm = _torch_unet(cfg)
    from tfmq_dm_tpu.utils.torch_convert import convert_state_dict
    params = convert_state_dict(tm.state_dict(),
                                ldm_unet.iter_layers(cfg))
    rng = np.random.RandomState(0)
    x = rng.randn(1, cfg.in_channels, cfg.image_size,
                  cfg.image_size).astype(np.float32)
    t = np.array([541], dtype=np.int64)
    kwargs_t, kwargs_j = {}, {}
    if cfg.use_spatial_transformer:
        c = rng.randn(1, 77, cfg.context_dim).astype(np.float32)
        kwargs_t["context"] = torch.from_numpy(c)
        kwargs_j["context"] = jnp.asarray(c)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(t),
                 **kwargs_t).numpy()
    del tm
    ours = ldm_unet.apply(params, cfg,
                          jnp.asarray(x.transpose(0, 2, 3, 1)),
                          jnp.asarray(t), **kwargs_j)
    ours = np.asarray(ours).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


def test_tib_matches_inline():
    cfg = ldm_unet.tiny_ldm_config()
    params = ldm_unet.init_params(jax.random.PRNGKey(1), cfg)
    t = jnp.array([5, 123], jnp.int32)
    outs = ldm_unet.tib_forward(params, cfg, t)
    n_res = sum(1 for k in params if k.endswith("emb_layers.1"))
    assert len(outs) == n_res


def test_diffusion_wrapper_conditioning_modes():
    """DiffusionWrapper dispatch (ddpm.py:1395-1424): concat prepends
    conditioning channels to x, crossattn concatenates context tokens,
    hybrid does both, adm routes class ids into label_emb. Each mode
    must equal the equivalent direct apply() call."""
    import numpy as np

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 8, 8, 3))
    t = jnp.array([5, 9], jnp.int32)

    # concat: in_channels covers x + 2 conditioning channels
    cfg_c = ldm_unet.tiny_ldm_config(in_channels=5)
    p_c = ldm_unet.init_params(jax.random.PRNGKey(1), cfg_c)
    cc = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 2))
    got = ldm_unet.diffusion_wrapper(p_c, cfg_c, "concat", x, t,
                                     c_concat=[cc])
    ref = ldm_unet.apply(p_c, cfg_c, jnp.concatenate([x, cc], -1), t)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    # crossattn: two context chunks concatenated on the token axis
    cfg_x = ldm_unet.tiny_sd_config()
    p_x = ldm_unet.init_params(jax.random.PRNGKey(3), cfg_x)
    c1 = jax.random.normal(jax.random.PRNGKey(4), (2, 3, 24))
    c2 = jax.random.normal(jax.random.PRNGKey(5), (2, 2, 24))
    got = ldm_unet.diffusion_wrapper(p_x, cfg_x, "crossattn", x, t,
                                     c_crossattn=[c1, c2])
    ref = ldm_unet.apply(p_x, cfg_x, x, t,
                         context=jnp.concatenate([c1, c2], 1))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    # hybrid
    cfg_h = ldm_unet.tiny_sd_config(in_channels=5)
    p_h = ldm_unet.init_params(jax.random.PRNGKey(6), cfg_h)
    got = ldm_unet.diffusion_wrapper(p_h, cfg_h, "hybrid", x, t,
                                     c_concat=[cc], c_crossattn=[c1])
    ref = ldm_unet.apply(p_h, cfg_h, jnp.concatenate([x, cc], -1), t,
                         context=c1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    # adm: label_emb path
    cfg_a = ldm_unet.tiny_ldm_config(num_classes=7)
    p_a = ldm_unet.init_params(jax.random.PRNGKey(7), cfg_a)
    y = jnp.array([1, 4], jnp.int32)
    got = ldm_unet.diffusion_wrapper(p_a, cfg_a, "adm", x, t,
                                     c_crossattn=[y])
    ref = ldm_unet.apply(p_a, cfg_a, x, t, y=y)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    # none
    cfg_n = ldm_unet.tiny_ldm_config()
    p_n = ldm_unet.init_params(jax.random.PRNGKey(8), cfg_n)
    got = ldm_unet.diffusion_wrapper(p_n, cfg_n, None, x, t)
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray(ldm_unet.apply(p_n, cfg_n, x, t)))
