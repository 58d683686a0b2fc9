"""Property tests of the spherical/cubemap geometry layer (SURVEY.md §4 priority b).

Round-trip invariants mirror the warp assertion at the reference's
depth_predictor_multiview_360.py:193 (all reprojections stay in-bounds) and the c2e/e2c
round-trip debug harness (encoder_costvolume.py:331-345).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatter360_tpu.geometry import (
    erp_pixel_grid,
    erp_to_spherical,
    spherical_to_cartesian,
    cartesian_to_spherical,
    spherical_to_erp,
    erp_ray_directions,
    unproject_erp_depth,
    quaternion_to_matrix,
    build_covariance,
    inverse_se3,
    interpolate_pose_6d,
    cube_face_extrinsics,
    cube_face_rotations,
    cube_face_intrinsics,
    erp_to_cube,
    cube_to_erp,
    eval_sh,
    rotate_sh,
    num_sh_coeffs,
)

H, W = 64, 128


def test_erp_spherical_roundtrip():
    xy = erp_pixel_grid(H, W)
    tp = erp_to_spherical(xy, H, W)
    xy2 = spherical_to_erp(tp, H, W)
    np.testing.assert_allclose(np.asarray(xy2), np.asarray(xy), atol=1e-4)


def test_spherical_cartesian_roundtrip():
    key = jax.random.PRNGKey(0)
    theta = jax.random.uniform(key, (1000,), minval=-np.pi + 1e-3, maxval=np.pi - 1e-3)
    phi = jax.random.uniform(
        jax.random.PRNGKey(1), (1000,), minval=-np.pi / 2 + 1e-3, maxval=np.pi / 2 - 1e-3
    )
    r = jax.random.uniform(jax.random.PRNGKey(2), (1000,), minval=0.1, maxval=10.0)
    tp = jnp.stack([theta, phi, r], -1)
    xyz = spherical_to_cartesian(tp)
    tp2 = cartesian_to_spherical(xyz)
    np.testing.assert_allclose(np.asarray(tp2), np.asarray(tp), atol=1e-4)


def test_reference_convention_values():
    """Pin the hm3d/replica convention: image center is +z, top row is +y (up)."""
    d = erp_ray_directions(H, W)
    center = d[H // 2, W // 2]
    # center pixel x = W/2 -> theta = -pi/W (half-pixel off 0) -> close to +z
    assert center[2] > 0.999
    top = d[0, W // 2]
    assert top[1] > 0.99  # +y is up
    # quarter to the left of center (pixel x = W/4) -> theta ~ +pi/2 -> +x
    left = d[H // 2, W // 4]
    assert left[0] > 0.99


def test_unproject_consistency():
    key = jax.random.PRNGKey(3)
    depth = jax.random.uniform(key, (H, W), minval=0.5, maxval=5.0)
    c2w = jnp.eye(4).at[:3, 3].set(jnp.array([1.0, -2.0, 0.5]))
    pts = unproject_erp_depth(depth, c2w)
    # distance from camera center == depth
    dist = jnp.linalg.norm(pts - c2w[:3, 3], axis=-1)
    np.testing.assert_allclose(np.asarray(dist), np.asarray(depth), rtol=1e-5)
    # reproject: world -> cam -> spherical -> pixel hits the original pixel
    cam = pts - c2w[:3, 3]
    tp = cartesian_to_spherical(cam)
    xy = spherical_to_erp(tp, H, W)
    grid = erp_pixel_grid(H, W)
    np.testing.assert_allclose(np.asarray(xy), np.asarray(grid), atol=1e-3)


def test_quaternion_covariance():
    key = jax.random.PRNGKey(4)
    q = jax.random.normal(key, (100, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    r = quaternion_to_matrix(q)
    eye = jnp.einsum("nij,nkj->nik", r, r)
    np.testing.assert_allclose(
        np.asarray(eye), np.broadcast_to(np.eye(3), (100, 3, 3)), atol=1e-5
    )
    dets = jnp.linalg.det(r)
    np.testing.assert_allclose(np.asarray(dets), 1.0, atol=1e-5)
    s = jax.random.uniform(jax.random.PRNGKey(5), (100, 3), minval=0.1, maxval=2.0)
    cov = build_covariance(s, q)
    np.testing.assert_allclose(np.asarray(cov), np.asarray(cov.swapaxes(-1, -2)), atol=1e-5)
    evals = jnp.linalg.eigvalsh(cov)
    assert (np.asarray(evals) > 0).all()


def test_inverse_se3():
    key = jax.random.PRNGKey(6)
    q = jax.random.normal(key, (10, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    rot = quaternion_to_matrix(q)
    t = jax.random.normal(jax.random.PRNGKey(7), (10, 3))
    pose = jnp.zeros((10, 4, 4)).at[:, :3, :3].set(rot).at[:, :3, 3].set(t)
    pose = pose.at[:, 3, 3].set(1.0)
    inv = inverse_se3(pose)
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("nij,njk->nik", pose, inv)),
        np.broadcast_to(np.eye(4), (10, 4, 4)),
        atol=1e-5,
    )


def test_pose_interpolation_endpoints():
    a = jnp.eye(4)
    rot = quaternion_to_matrix(jnp.array([0.3, 0.1, -0.2, 0.9]) / jnp.linalg.norm(jnp.array([0.3, 0.1, -0.2, 0.9])))
    b = jnp.eye(4).at[:3, :3].set(rot).at[:3, 3].set(jnp.array([1.0, 2.0, 3.0]))
    np.testing.assert_allclose(np.asarray(interpolate_pose_6d(a, b, 0.0)), np.asarray(a), atol=1e-5)
    np.testing.assert_allclose(np.asarray(interpolate_pose_6d(a, b, 1.0)), np.asarray(b), atol=1e-5)
    mid = interpolate_pose_6d(a, b, 0.5)
    r = mid[:3, :3]
    np.testing.assert_allclose(np.asarray(r @ r.T), np.eye(3), atol=1e-5)


def test_cube_face_rotations_proper():
    rots = np.asarray(cube_face_rotations())
    for f in range(6):
        np.testing.assert_allclose(rots[f] @ rots[f].T, np.eye(3), atol=1e-6)
        assert np.linalg.det(rots[f]) > 0.99
    # forward axes cover all 6 +-axis directions
    fwd = rots[:, :, 2]
    expected = {(0, 0, 1), (-1, 0, 0), (0, 0, -1), (1, 0, 0), (0, 1, 0), (0, -1, 0)}
    got = {tuple(int(round(v)) for v in f) for f in fwd}
    assert got == expected


def test_erp_cube_roundtrip():
    """e2c then c2e reproduces a smooth ERP image away from face seams."""
    key = jax.random.PRNGKey(8)
    # smooth image: low-frequency pattern
    yy, xx = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    img = jnp.stack(
        [
            jnp.sin(2 * jnp.pi * xx / W) * jnp.cos(jnp.pi * yy / H),
            jnp.cos(4 * jnp.pi * xx / W),
            jnp.sin(jnp.pi * yy / H),
        ],
        axis=-1,
    ) * 0.5 + 0.5
    faces = erp_to_cube(img, face_w=H // 2)
    assert faces.shape == (6, H // 2, H // 2, 3)
    back = cube_to_erp(faces, H, W)
    err = jnp.abs(back - img)
    # interior rows (away from poles where faces are coarsest)
    assert float(err[H // 8 : -H // 8].mean()) < 0.02


def test_cube_face_extrinsics_shape_and_orthonormal():
    c2w = jnp.eye(4).at[:3, 3].set(jnp.array([1.0, 0.0, -1.0]))
    faces = cube_face_extrinsics(c2w)
    assert faces.shape == (6, 4, 4)
    for f in range(6):
        r = np.asarray(faces[f, :3, :3])
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
        np.testing.assert_allclose(np.asarray(faces[f, :3, 3]), [1.0, 0.0, -1.0])


@pytest.mark.parametrize("degree", [0, 1, 2, 3, 4])
def test_sh_rotation_consistency(degree):
    """eval_sh(rotate_sh(c, R), R @ d) == eval_sh(c, d) — the defining property."""
    key = jax.random.PRNGKey(9)
    n = num_sh_coeffs(degree)
    sh = jax.random.normal(key, (5, 3, n))
    q = jax.random.normal(jax.random.PRNGKey(10), (5, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    rot = quaternion_to_matrix(q)
    d = jax.random.normal(jax.random.PRNGKey(11), (5, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    sh_rot = rotate_sh(sh, rot, degree)
    d_rot = jnp.einsum("nij,nj->ni", rot, d)
    lhs = eval_sh(sh_rot, d_rot, degree)
    rhs = eval_sh(sh, d, degree)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-4)


def test_sh_dc_only_rotation_invariant():
    sh = jnp.zeros((3, 25)).at[:, 0].set(jnp.array([1.0, 2.0, 3.0]))
    rot = quaternion_to_matrix(jnp.array([0.5, 0.5, 0.5, 0.5]))
    sh_rot = rotate_sh(sh, rot, 4)
    np.testing.assert_allclose(np.asarray(sh_rot), np.asarray(sh), atol=1e-5)


def test_zdepth_to_distance_inverts_cube_cos_factor():
    """distance -> z (cosmaps factor) -> distance round-trips on every face.

    The cube rig's z-depth factor is the cosine to the face normal; for the
    normalized fx=fy=cx=cy=0.5 face intrinsics, zdepth_to_distance must be its
    exact multiplicative inverse (reference z_depth_to_distance.py:4-34, with
    the meshgrid transpose fixed — this test would catch a u/v swap because the
    factor map is not symmetric under transpose for non-square features, and we
    additionally check an asymmetric distance field).
    """
    from splatter360_tpu.geometry.cubemap import (
        erp_distance_to_cube_zdepth_factor, zdepth_to_distance,
    )

    fw = 16
    factor = np.asarray(erp_distance_to_cube_zdepth_factor(fw))  # [6, fw, fw]
    rng = np.random.RandomState(0)
    dist = 1.0 + rng.rand(6, fw, fw).astype(np.float32) * 4.0
    z = dist * factor
    back = np.asarray(zdepth_to_distance(jnp.asarray(z), 0.5, 0.5, 0.5, 0.5))
    np.testing.assert_allclose(back, dist, rtol=2e-5)


def test_zdepth_to_distance_axis_orientation():
    """u varies along width, v along height (the reference's latent bug)."""
    from splatter360_tpu.geometry.cubemap import zdepth_to_distance

    h, w = 4, 8
    z = jnp.ones((h, w))
    # fx huge -> x contribution ~0; distance varies along HEIGHT only.
    d = np.asarray(zdepth_to_distance(z, 1e9, 0.5, 0.5, 0.5))
    assert np.allclose(d, d[:, :1], atol=1e-6)  # constant along width
    assert not np.allclose(d, d[:1, :], atol=1e-3)  # varies along height


def test_covariance_sym6_matches_matrix_path():
    """build_covariance_sym6 (the scalarized, layout-friendly model path) ==
    R_w @ build_covariance(s, q) @ R_w^T, including the folded world rotation;
    cov_as_sym6/sym6_to_matrix round-trip."""
    from splatter360_tpu.geometry.transforms import (
        build_covariance, build_covariance_sym6, cov_as_sym6, sym6_to_matrix,
    )

    key = jax.random.PRNGKey(11)
    q = jax.random.normal(key, (64, 4))
    s = jax.random.uniform(jax.random.PRNGKey(12), (64, 3), minval=0.1,
                           maxval=2.0)
    # a valid world rotation from a reference quaternion
    rw = quaternion_to_matrix(
        jax.random.normal(jax.random.PRNGKey(13), (4,))
        / jnp.linalg.norm(jax.random.normal(jax.random.PRNGKey(13), (4,)))
    )
    want = jnp.einsum("ij,njk,lk->nil", rw, build_covariance(s, q), rw)
    got6 = build_covariance_sym6(s, q, world_rot=rw)
    np.testing.assert_allclose(
        np.asarray(sym6_to_matrix(got6)), np.asarray(want), atol=1e-5
    )
    # round-trip + matrix normalization
    np.testing.assert_allclose(
        np.asarray(cov_as_sym6(want)), np.asarray(got6), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(build_covariance_sym6(s, q)),
        np.asarray(cov_as_sym6(build_covariance(s, q))), atol=1e-5,
    )
