"""Real spherical harmonics: evaluation (3DGS convention, degrees 0..4) and rotation.

Parity notes:
  * eval_sh reproduces the SH basis of the CUDA 3DGS rasterizer (graphdeco-inria) used by
    the reference's diff-gaussian-rasterization-modified extension (colors are evaluated
    per Gaussian from the view direction, DC term + 0.5, clamped >= 0 by the caller) —
    see /root/reference/src/model/decoder/cuda_splatting.py:99-124 for the call contract.
  * rotate_sh replaces the reference's e3nn Wigner-D path
    (/root/reference/src/misc/sh_rotation.py:10-30) with a TPU-friendly, convention-free
    construction: per-degree rotation matrices are obtained by projecting the rotated
    basis onto the unrotated one over a fixed set of sample directions. Because the same
    basis is used for evaluation and rotation, consistency is guaranteed by construction:
        eval_sh(rotate_sh(sh, R), R @ d) == eval_sh(sh, d).
  * The SH band mask (DC-biased init, 0.1 * 0.25**degree) lives in the Gaussian adapter.

All rotation matrices for a given max degree are precomputed as a single [N, N] linear
map per rotation via two small matmuls — batched, differentiable w.r.t. sh coefficients,
and cheap (one per context view, not per Gaussian).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


def num_sh_coeffs(degree: int) -> int:
    return (degree + 1) ** 2


# 3DGS SH constants (degrees 0..3 exactly as the CUDA rasterizer; degree 4 uses the
# standard real-SH normalization, matching the pixelSplat fork's extension).
_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
       -1.0925484305920792, 0.5462742152960396)
_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
       0.3731763325901154, -0.4570457994644658, 1.445305721320277,
       -0.5900435899266435)
_C4 = (2.5033429417967046, -1.7701307697799304, 0.9461746957575601,
       -0.6690465435572892, 0.10578554691520431, -0.6690465435572892,
       0.47308734787878004, -1.7701307697799304, 0.6258357354491761)


def _sh_basis(dirs, xp):
    """Evaluate the (degree<=4) real SH basis at unit directions.

    dirs: [..., 3] (assumed normalized). Returns [..., 25] basis values, of which the
    caller keeps the first (degree+1)^2. Works for both numpy (xp=np) and jax.numpy.
    """
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    one = xp.ones_like(x)
    b = [
        _C0 * one,
        -_C1 * y, _C1 * z, -_C1 * x,
        _C2[0] * xy, _C2[1] * yz, _C2[2] * (2.0 * zz - xx - yy),
        _C2[3] * xz, _C2[4] * (xx - yy),
        _C3[0] * y * (3.0 * xx - yy), _C3[1] * xy * z,
        _C3[2] * y * (4.0 * zz - xx - yy),
        _C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
        _C3[4] * x * (4.0 * zz - xx - yy), _C3[5] * z * (xx - yy),
        _C3[6] * x * (xx - 3.0 * yy),
        _C4[0] * xy * (xx - yy), _C4[1] * yz * (3.0 * xx - yy),
        _C4[2] * xy * (7.0 * zz - 1.0), _C4[3] * yz * (7.0 * zz - 3.0),
        _C4[4] * (zz * (35.0 * zz - 30.0) + 3.0), _C4[5] * xz * (7.0 * zz - 3.0),
        _C4[6] * (xx - yy) * (7.0 * zz - 1.0), _C4[7] * xz * (xx - 3.0 * yy),
        _C4[8] * (xx * (xx - 3.0 * yy) - yy * (3.0 * xx - yy)),
    ]
    return xp.stack(b, axis=-1)


def eval_sh(sh: jnp.ndarray, dirs: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Evaluate SH-encoded color at unit view directions.

    sh: [..., C, (degree+1)^2]; dirs: [..., 3] -> [..., C].
    (The +0.5 offset and clamp of the 3DGS convention are applied by the renderer.)
    """
    n = num_sh_coeffs(degree)
    basis = _sh_basis(dirs, jnp)[..., :n]  # [..., n]
    return jnp.einsum("...cn,...n->...c", sh[..., :n], basis)


@functools.lru_cache(maxsize=8)
def _projection_dirs_and_pinv(degree: int):
    """Fixed unit sample directions D and pinv(B(D)) for the rotation projection.

    Uses a deterministic Fibonacci sphere with K = 4 * (degree+1)^2 points; B(D) has
    full column rank for degree <= 4, so pinv(B) @ B(R^T D) is the exact per-rotation
    SH transport matrix.
    """
    n = num_sh_coeffs(degree)
    k = 4 * n
    i = np.arange(k, dtype=np.float64) + 0.5
    golden = (1.0 + 5.0**0.5) / 2.0
    phi = np.arccos(1.0 - 2.0 * i / k)
    theta = 2.0 * np.pi * i / golden
    dirs = np.stack(
        [np.sin(phi) * np.cos(theta), np.sin(phi) * np.sin(theta), np.cos(phi)],
        axis=-1,
    )
    basis = _sh_basis(dirs, np)[..., :n]  # [K, n]
    pinv = np.linalg.pinv(basis)  # [n, K]
    return dirs.astype(np.float32), pinv.astype(np.float32)


def sh_rotation_matrices(rotations: jnp.ndarray, degree: int) -> jnp.ndarray:
    """SH transport matrices M(R) [..., n, n] such that for coefficients c' = M c:
        eval_sh(c', R @ d) == eval_sh(c, d)  for all unit d.

    rotations: [..., 3, 3].
    """
    dirs, pinv = _projection_dirs_and_pinv(degree)
    dirs = jnp.asarray(dirs)  # [K, 3]
    pinv = jnp.asarray(pinv)  # [n, K]
    # Basis evaluated at R^T d_k: row k of B_rot is the rotated-frame basis at d_k.
    d_rot = jnp.einsum("...ji,kj->...ki", rotations, dirs)  # R^T @ d  -> [..., K, 3]
    b_rot = _sh_basis(d_rot, jnp)[..., : pinv.shape[0]]  # [..., K, n]
    return jnp.einsum("nk,...km->...nm", pinv, b_rot)


def rotate_sh(sh: jnp.ndarray, rotations: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Rotate SH coefficients [..., C, n] by rotations [..., 3, 3] (broadcasting).

    Equivalent in role to the reference's rotate_sh (sh_rotation.py:10-30): used to carry
    camera-frame SH predictions into world space with the c2w rotation.
    """
    m = sh_rotation_matrices(rotations, degree)  # [..., n, n]
    return jnp.einsum("...nm,...cm->...cn", m, sh)
