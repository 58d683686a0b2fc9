"""Offline metric recomputation across methods' saved frames (SURVEY.md §2.8 parity
with src/evaluation/metric_computer.py:15-117 + src/scripts/compute_metrics.py).

Given a ground-truth directory and one directory of saved frames per method
(matching filenames), recomputes PSNR/SSIM (and LPIPS when a metric fn is supplied),
prints a running table, and writes side-by-side comparison sheets.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..utils.image_io import hcat, load_image, save_image
from ..train.metrics import compute_psnr, compute_ssim


def compute_metrics_offline(
    gt_dir: str,
    method_dirs: dict,
    out_dir: str,
    lpips_fn=None,
    save_sheets: bool = True,
) -> dict:
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    gt_files = sorted(Path(gt_dir).glob("*.png"))
    results: dict = {}
    for method, mdir in method_dirs.items():
        psnrs, ssims, lpipss = [], [], []
        for f in gt_files:
            pred_path = Path(mdir) / f.name
            if not pred_path.exists():
                continue
            gt = load_image(f)[None]
            pred = load_image(pred_path)[None]
            psnrs.append(float(compute_psnr(jnp.asarray(gt), jnp.asarray(pred))[0]))
            ssims.append(float(compute_ssim(jnp.asarray(gt), jnp.asarray(pred))[0]))
            if lpips_fn is not None:
                lpipss.append(float(lpips_fn(pred, gt)[0]))
            if save_sheets:
                save_image(
                    hcat(pred[0], gt[0], pad=4),
                    out / "sheets" / method / f.name,
                )
        results[method] = {
            "psnr": float(np.mean(psnrs)) if psnrs else None,
            "ssim": float(np.mean(ssims)) if ssims else None,
            "lpips": float(np.mean(lpipss)) if lpipss else None,
            "n": len(psnrs),
        }
        print(f"{method}: {results[method]}")
    (out / "metrics.json").write_text(json.dumps(results, indent=2))
    return results
