"""Config system.

The reference uses plain Python modules imported as `cfg`, mutated at runtime,
with a JSON snapshot dumped per run (`train_ID-Booth.py:72,1316-1322`;
`FR_training/train_FR.py:42,76-87`). Here configs are frozen-ish dataclasses
with the same parameter surface, plus the same JSON-snapshot contract.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any


@dataclasses.dataclass
class ConfigBase:
    def replace(self, **kw) -> "ConfigBase":
        return dataclasses.replace(self, **kw)

    def to_dict(self) -> dict:
        out = {}
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if dataclasses.is_dataclass(v):
                v = dataclasses.asdict(v)
            out[f.name] = v
        return out


def _jsonable(v: Any):
    if isinstance(v, (str, int, float, bool)) or v is None:
        return v
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    if isinstance(v, dict):
        return {str(k): _jsonable(x) for k, x in v.items()}
    return repr(v)


def snapshot_config(cfg: Any, output_dir: str, name: str = "training_config.json"):
    """Dump the full config to JSON in the run directory, mirroring the
    reference's reproducibility contract (`train_ID-Booth.py:1316-1322`)."""
    os.makedirs(output_dir, exist_ok=True)
    d = cfg.to_dict() if hasattr(cfg, "to_dict") else dict(cfg)
    path = os.path.join(output_dir, name)
    with open(path, "w") as f:
        json.dump({k: _jsonable(v) for k, v in d.items()}, f, indent=2, sort_keys=True)
    return path
