"""Metrics logging.

Capability parity: reference `serl_launcher/common/wandb.py` (`WandBLogger`
:24-94 — nested-dict flattening to "a/b" keys, debug/disabled mode, absl
flag capture). wandb is not in this image, so the same surface logs to
wandb when importable and always to a local JSONL file (which also stands in
for the reference's RLDS trajectory logging of metrics streams).
"""

import datetime
import json
import os
import tempfile
from typing import Optional

import numpy as np


def _flatten(d, parent="", sep="/"):
    out = {}
    for k, v in d.items():
        key = parent + sep + k if parent else k
        if isinstance(v, dict):
            out.update(_flatten(v, key, sep))
        else:
            out[key] = v
    return out


def _to_scalar(v):
    if isinstance(v, (int, float, str, bool)) or v is None:
        return v
    arr = np.asarray(v)
    if arr.ndim == 0:
        return arr.item()
    return arr.tolist() if arr.size <= 16 else float(arr.mean())


class Logger:
    """wandb-compatible logger surface with a JSONL backend."""

    def __init__(
        self,
        project: str = "serl_tpu",
        description: str = "run",
        output_dir: Optional[str] = None,
        variant: Optional[dict] = None,
        debug: bool = False,
    ):
        self.debug = debug
        stamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
        self.run_name = f"{description}_{stamp}"
        self.output_dir = output_dir or os.path.join(
            tempfile.gettempdir(), "serl_tpu_logs"
        )
        os.makedirs(self.output_dir, exist_ok=True)
        self._path = os.path.join(self.output_dir, self.run_name + ".jsonl")
        self._fh = None if debug else open(self._path, "a")

        self._wandb = None
        if not debug:
            try:
                import wandb

                self._wandb = wandb.init(
                    project=project, name=self.run_name, config=variant or {}
                )
            except Exception:
                self._wandb = None
        if variant and self._fh:
            self._fh.write(json.dumps({"_config": _flatten(variant)}) + "\n")

    def log(self, data: dict, step: Optional[int] = None):
        flat = {k: _to_scalar(v) for k, v in _flatten(data).items()}
        if step is not None:
            flat["_step"] = int(step)
        if self._fh:
            self._fh.write(json.dumps(flat) + "\n")
            self._fh.flush()
        if self._wandb is not None:
            self._wandb.log(flat, step=step)

    def close(self):
        if self._fh:
            self._fh.close()
        if self._wandb is not None:
            self._wandb.finish()


# Backwards-compatible alias matching the reference's class name
WandBLogger = Logger
