"""Run-directory + logging setup.

Mirrors the reference's per-run layout ``logdir/samples/<ts>/{run.log,
img/, numpy/}`` with a config dump next to the outputs
(sample_diffusion_ddim.py:134-157; sample_diffusion_ldm.py:551-555), with
process-0 filtering instead of linklink's RankFilter
(log_helper.py:33-48).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import time
from typing import Optional

import jax


class ProcessZeroFilter(logging.Filter):
    def filter(self, record):
        return jax.process_index() == 0


def setup_run_dir(logdir: str, config=None,
                  name: Optional[str] = None) -> str:
    """Create logdir/samples/<ts>/ with img/ + numpy/, attach a file
    handler, dump the config as json. Returns the run dir path."""
    ts = name or time.strftime("%Y-%m-%dT%H-%M-%S")
    run_dir = os.path.join(logdir, "samples", ts)
    if jax.process_index() == 0:
        os.makedirs(os.path.join(run_dir, "img"), exist_ok=True)
        os.makedirs(os.path.join(run_dir, "numpy"), exist_ok=True)
        handler = logging.FileHandler(os.path.join(run_dir, "run.log"))
        handler.setFormatter(logging.Formatter(
            "%(asctime)s %(name)s: %(message)s"))
        root = logging.getLogger()
        root.addHandler(handler)
        for h in root.handlers:
            h.addFilter(ProcessZeroFilter())
        if config is not None:
            if dataclasses.is_dataclass(config):
                blob = dataclasses.asdict(config)
            else:
                blob = dict(config)
            with open(os.path.join(run_dir, "config.json"), "w") as f:
                json.dump(blob, f, indent=2, default=str)
    return run_dir
