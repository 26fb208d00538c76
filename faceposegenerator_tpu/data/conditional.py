"""Flat ↔ conditional dataset layout converters.

Behavioral rebuild of `Evaluation/convert_to_conditional_dataset_for_
evaluation.ipynb` (cell 0): reshape flat `<id>_<img>` files into per-ID
subfolders for class-conditional evaluation (per-class Vendi etc.), and the
inverse for FR-training consumption.
"""

from __future__ import annotations

import os
import shutil
from typing import Dict


def flat_to_conditional(flat_dir: str, out_dir: str, copy: bool = True) -> Dict[str, int]:
    """`<flat>/<id>_<img>.jpg` → `<out>/<id>/<id>_<img>.jpg`."""
    os.makedirs(out_dir, exist_ok=True)
    counts: Dict[str, int] = {}
    for f in sorted(os.listdir(flat_dir)):
        if not f.lower().endswith((".jpg", ".jpeg", ".png")):
            continue
        ident = f.split("_")[0]
        d = os.path.join(out_dir, ident)
        os.makedirs(d, exist_ok=True)
        op = shutil.copy if copy else shutil.move
        op(os.path.join(flat_dir, f), os.path.join(d, f))
        counts[ident] = counts.get(ident, 0) + 1
    return counts


def conditional_to_flat(cond_dir: str, out_dir: str, copy: bool = True) -> int:
    """`<cond>/<id>/<img>` → `<out>/<id>_<img>` (FR label convention)."""
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for ident in sorted(os.listdir(cond_dir)):
        d = os.path.join(cond_dir, ident)
        if not os.path.isdir(d):
            continue
        for f in sorted(os.listdir(d)):
            if not f.lower().endswith((".jpg", ".jpeg", ".png")):
                continue
            name = f if f.startswith(f"{ident}_") else f"{ident}_{f}"
            op = shutil.copy if copy else shutil.move
            op(os.path.join(d, f), os.path.join(out_dir, name))
            n += 1
    return n
