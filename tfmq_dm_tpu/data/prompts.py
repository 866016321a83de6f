"""Prompt/class-label data helpers for conditional calibration + eval.

Re-specifies txt2img.py:110-130 (COCO captions json, parquet eval
prompts) without the pandas dependency on the hot path.
"""

from __future__ import annotations

import json
import math
import random
from typing import List


def coco_prompts(path: str, num: int = 128,
                 seed: int = 0) -> List[str]:
    """Sample ``num`` captions from a COCO-captions annotations json
    (txt2img.get_prompts)."""
    with open(path) as f:
        anns = json.load(f)["annotations"]
    rng = random.Random(seed)
    return [a["caption"] for a in rng.sample(anns, num)]


def prompts_from_file(path: str) -> List[str]:
    """One prompt per line (txt2img --from-file)."""
    with open(path) as f:
        return [ln.strip() for ln in f if ln.strip()]


def prompts_for_eval(path: str, batch_size: int = 1) -> List[List[str]]:
    """Batched eval prompts from parquet (txt2img.prompts4eval) or a
    plain text file."""
    if path.endswith(".parquet"):
        import pandas as pd
        prompts = pd.read_parquet(path)["caption"].tolist()
    else:
        prompts = prompts_from_file(path)
    n = math.ceil(len(prompts) / batch_size)
    return [prompts[i * batch_size:(i + 1) * batch_size] for i in range(n)]


def imagenet_eval_classes(num_classes: int = 32, per_class: int = 8,
                          seed: int = 42) -> List[int]:
    """The ImageNet cali class sampling pattern
    (data_generate.py:116-154: random classes x per-class samples)."""
    rng = random.Random(seed)
    classes = rng.sample(range(1000), num_classes)
    return [c for c in classes for _ in range(per_class)]
