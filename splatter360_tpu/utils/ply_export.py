"""Gaussian -> .ply export (SURVEY.md §2.8, src/model/ply_export.py:26-92 parity:
Polycam-style orientation convention, DC band only unless full SH requested)."""

from __future__ import annotations

from pathlib import Path

import numpy as np


def export_ply(
    means: np.ndarray,        # [N, 3]
    scales: np.ndarray,       # [N, 3]
    rotations: np.ndarray,    # [N, 4] xyzw
    harmonics: np.ndarray,    # [N, 3, d_sh]
    opacities: np.ndarray,    # [N]
    path,
) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    n = means.shape[0]

    f_dc = np.asarray(harmonics)[:, :, 0]  # DC band
    log_scales = np.log(np.clip(np.asarray(scales), 1e-8, None))
    # inverse sigmoid for opacity (3DGS ply convention)
    op = np.clip(np.asarray(opacities), 1e-6, 1 - 1e-6)
    op_logit = np.log(op / (1 - op))
    # xyzw -> wxyz (3DGS ply stores rot_0..rot_3 = w x y z)
    rot = np.asarray(rotations)[:, [3, 0, 1, 2]]

    props = (
        ["x", "y", "z", "nx", "ny", "nz"]
        + [f"f_dc_{i}" for i in range(3)]
        + ["opacity"]
        + [f"scale_{i}" for i in range(3)]
        + [f"rot_{i}" for i in range(4)]
    )
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        + "".join(f"property float {p}\n" for p in props)
        + "end_header\n"
    )
    data = np.concatenate(
        [
            np.asarray(means, np.float32),
            np.zeros((n, 3), np.float32),
            f_dc.astype(np.float32),
            op_logit[:, None].astype(np.float32),
            log_scales.astype(np.float32),
            rot.astype(np.float32),
        ],
        axis=1,
    ).astype("<f4")
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(data.tobytes())
