"""BERT text encoder (LDM text2img conditioning): golden numerical
parity against the reference's BERTEmbedder transformer
(ldm/modules/x_transformer.py TransformerWrapper + Encoder, wired at
encoders/modules.py:80-103), plus checkpoint-conversion coverage and
the tiny BERT-conditioned task end to end. Skipped when /root/reference
is absent."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfmq_dm_tpu.models import bert_text
from tfmq_dm_tpu.utils.torch_convert import convert_state_dict

REF = "/root/reference/stable-diffusion"
ref_available = os.path.isdir(REF)


def _torch_transformer(cfg: bert_text.BERTTextConfig):
    import torch
    sys.path.insert(0, REF)
    from ldm.modules.x_transformer import Encoder, TransformerWrapper
    torch.manual_seed(0)
    m = TransformerWrapper(
        num_tokens=cfg.vocab_size, max_seq_len=cfg.max_len,
        attn_layers=Encoder(dim=cfg.dim, depth=cfg.depth,
                            heads=cfg.heads, attn_dim_head=cfg.dim_head))
    return m.eval()


@pytest.mark.skipif(not ref_available, reason="reference tree absent")
def test_golden_parity_vs_reference():
    import torch
    cfg = bert_text.tiny_bert_config()
    tm = _torch_transformer(cfg)
    params = convert_state_dict(tm.state_dict(),
                                bert_text.iter_layers(cfg))
    ids = np.random.RandomState(0).randint(0, cfg.vocab_size,
                                           (3, cfg.max_len))
    with torch.no_grad():
        ref = tm(torch.from_numpy(ids), return_embeddings=True).numpy()
    out = np.asarray(jax.jit(
        lambda p, i: bert_text.apply(p, cfg, i))(
        params, jnp.asarray(ids, jnp.int32)))
    assert out.shape == ref.shape == (3, cfg.max_len, cfg.dim)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


@pytest.mark.skipif(not ref_available, reason="reference tree absent")
def test_iter_layers_covers_checkpoint():
    """Every learned tensor in the torch state_dict is consumed by
    iter_layers, except the unused to_logits head (return_embeddings
    path, x_transformer.py:628)."""
    cfg = bert_text.tiny_bert_config()
    tm = _torch_transformer(cfg)
    sd_keys = set(tm.state_dict().keys())
    ours = set()
    for kind, name, _ in bert_text.iter_layers(cfg):
        if kind == "lnorm":
            ours |= {f"{name}.weight", f"{name}.bias"}
        elif kind == "embed":
            ours.add(f"{name}.weight")
        else:
            ours.add(f"{name}.weight")
            if kind == "linear":
                ours.add(f"{name}.bias")
    assert ours <= sd_keys
    leftover = sd_keys - ours
    assert all(k.startswith("to_logits.") for k in leftover), leftover


def test_init_apply_shapes_and_stub_tokenizer():
    cfg = bert_text.tiny_bert_config()
    params = bert_text.init_params(jax.random.PRNGKey(0), cfg)
    toks = bert_text.stub_tokenize(["a cat", "a dog on a mat"], cfg)
    assert toks.shape == (2, cfg.max_len)
    out = jax.jit(lambda p, i: bert_text.apply(p, cfg, i))(params, toks)
    assert out.shape == (2, cfg.max_len, cfg.dim)
    assert np.all(np.isfinite(np.asarray(out)))
    # determinism of the stub tokenizer
    toks2 = bert_text.stub_tokenize(["a cat", "a dog on a mat"], cfg)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(toks2))


def test_task_registry_has_bert_tasks():
    from tfmq_dm_tpu.configs.tasks import get_task
    for name, ctx_dim in (("text2img_256", 640), ("txt2img_1p4b", 1280)):
        task = get_task(name)
        assert task.cond == "text" and task.bert is not None
        assert task.bert.dim == ctx_dim == task.unet.context_dim
    tiny = get_task("tiny_bert")
    assert tiny.bert.dim == tiny.unet.context_dim == 32
