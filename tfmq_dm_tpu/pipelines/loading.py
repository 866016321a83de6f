"""Checkpoint loading: torch reference checkpoints -> JAX param pytrees.

Handles the reference's checkpoint layouts:
- DDIM family: a bare ``state_dict`` (optionally DataParallel
  'module.'-prefixed, optionally a [state, ..., ema] list —
  ddim/runners/diffusion.py:205-243);
- LDM/SD: PyTorch-Lightning ``{'state_dict': ...}`` with submodule
  prefixes ``model.diffusion_model.`` / ``first_stage_model.`` /
  ``cond_stage_model.``, plus LitEma weights under ``model_ema.*`` with
  dots stripped from names (ldm/modules/ema.py; EMA swap at
  sample_diffusion_ldm.py:441-442).

torch is used host-side only, for deserialization.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional

from ..configs.tasks import TaskConfig
from ..models import clip_text, ddim_unet, ldm_unet, vae as vae_mod
from ..utils.torch_convert import convert_state_dict

logger = logging.getLogger(__name__)


def _torch_load(path: str):
    import torch
    return torch.load(path, map_location="cpu", weights_only=False)


def _strip_prefix(sd: Dict, prefix: str) -> Dict:
    return {k[len(prefix):]: v for k, v in sd.items()
            if k.startswith(prefix)}


def _apply_ema(unet_sd: Dict, full_sd: Dict) -> Dict:
    """Swap in LitEma weights: ema names are the param names with dots
    removed, under 'model_ema.' (ldm/modules/ema.py:5-40)."""
    ema = _strip_prefix(full_sd, "model_ema.")
    if not ema:
        return unet_sd
    out = dict(unet_sd)
    n = 0
    for k in unet_sd:
        ek = ("diffusion_model." + k).replace(".", "")
        if ek in ema:
            out[k] = ema[ek]
            n += 1
    logger.info("EMA swap: %d/%d tensors", n, len(unet_sd))
    return out


def load_ddim_checkpoint(path: str, cfg: ddim_unet.DDIMUNetConfig,
                         use_ema: bool = True) -> Dict:
    """DDIM checkpoints: either a bare (possibly EMA'd) state dict — the
    pretrained-DDPM download path — or the trainer's
    [state, opt, epoch, step, ema_state] list, where the EMAHelper
    shadow params replace the raw weights when ``use_ema``
    (ddim/runners/diffusion.py:205-228, models/ema.py)."""
    states = _torch_load(path)
    ema = None
    if isinstance(states, (list, tuple)):
        sd = states[0]
        if use_ema and len(states) >= 2 and \
                isinstance(states[-1], dict) and any(
                    hasattr(v, "shape") for v in states[-1].values()):
            ema = states[-1]
    else:
        sd = states.get("state_dict", states)
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    if ema:
        ema = {k.removeprefix("module."): v for k, v in ema.items()}
        n = sum(1 for k in sd if k in ema)
        sd = {k: ema.get(k, v) for k, v in sd.items()}
        logger.info("EMA swap: %d/%d tensors", n, len(sd))
    return convert_state_dict(sd, ddim_unet.iter_layers(cfg))


def load_ldm_checkpoint(path: str, task: TaskConfig,
                        use_ema: Optional[bool] = None):
    """Returns (unet_params, vae_params, cond_params_or_None)."""
    full = _torch_load(path)
    sd = full.get("state_dict", full)
    unet_sd = _strip_prefix(sd, "model.diffusion_model.")
    if (task.use_ema if use_ema is None else use_ema):
        unet_sd = _apply_ema(unet_sd, sd)
    unet_params = convert_state_dict(unet_sd,
                                     ldm_unet.iter_layers(task.unet))
    vae_sd = _strip_prefix(sd, "first_stage_model.")
    vae_params = convert_state_dict(
        vae_sd, vae_mod.iter_layers(
            task.vae, encoder=any(k.startswith("encoder.")
                                  for k in vae_sd)))
    cond_params = None
    if task.cond == "text":
        cond_sd = _strip_prefix(sd, "cond_stage_model.transformer.")
        if cond_sd and getattr(task, "bert", None) is not None:
            # BERTEmbedder checkpoints (x_transformer TransformerWrapper
            # keys: token_emb/pos_emb/attn_layers.*)
            from ..models import bert_text
            cond_params = convert_state_dict(
                cond_sd, bert_text.iter_layers(task.bert))
        elif cond_sd:
            ccfg = task.clip or clip_text.vit_l_14_config()
            cond_params = convert_state_dict(
                cond_sd, clip_text.iter_layers(ccfg))
    elif task.cond == "class":
        import jax.numpy as jnp
        import numpy as np
        w = sd.get("cond_stage_model.embedding.weight")
        if w is not None:
            cond_params = {"embedding": jnp.asarray(
                np.asarray(w.detach().cpu().numpy()))}
    return unet_params, vae_params, cond_params
