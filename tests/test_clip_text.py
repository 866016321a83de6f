"""CLIP text encoder golden parity vs a randomly initialized HF
CLIPTextModel (built from config — no network access needed)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tfmq_dm_tpu.models import clip_text

transformers = pytest.importorskip("transformers")


def test_golden_parity_vs_hf():
    import torch
    from transformers import CLIPTextConfig, CLIPTextModel

    cfg = clip_text.tiny_clip_config()
    hf_cfg = CLIPTextConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.width,
        intermediate_size=4 * cfg.width, num_hidden_layers=cfg.layers,
        num_attention_heads=cfg.heads,
        max_position_embeddings=cfg.max_len, hidden_act="quick_gelu")
    torch.manual_seed(0)
    tm = CLIPTextModel(hf_cfg).eval()

    from tfmq_dm_tpu.utils.torch_convert import convert_state_dict
    params = convert_state_dict(tm.state_dict(),
                                clip_text.iter_layers(cfg))
    rng = np.random.RandomState(0)
    ids = rng.randint(0, cfg.vocab_size, (2, cfg.max_len))
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids)).last_hidden_state.numpy()
    got = clip_text.apply(params, cfg, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=1e-3)


def test_class_embed_shape():
    table = jax.random.normal(jax.random.PRNGKey(0), (10, 8))
    c = clip_text.class_embed(table, jnp.array([1, 2, 3]))
    assert c.shape == (3, 1, 8)
    np.testing.assert_allclose(np.asarray(c[0, 0]), np.asarray(table[1]))
