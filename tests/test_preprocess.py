"""Tests for the offline dataset-generation pipeline (preprocess/).

Covers the reference data-generation invariants (SURVEY.md §3.4): collision-free
trajectories over the navmesh stand-in, the zero-ratio frame filter on a closed
world, the cube-rig stitch path agreeing with direct ERP rendering, and the
written scenes round-tripping through the training data contract.
"""

import numpy as np
import pytest

from splatter360_tpu.preprocess import (
    build_room_world, generate_scene, sample_trajectory,
)
from splatter360_tpu.preprocess.generate import _render_frames


@pytest.fixture(scope="module")
def world():
    return build_room_world(seed=3, spacing=0.22, n_furniture=2, sh_degree=1)


def test_room_world_shapes(world):
    n = world.means.shape[0]
    assert n > 500
    assert world.covariances.shape == (n, 3, 3)
    assert world.harmonics.shape == (n, 3, 4)
    assert world.opacities.shape == (n,)
    assert np.all(world.opacities > 0.5)
    # covariances are symmetric PSD
    sym_err = np.abs(world.covariances - world.covariances.transpose(0, 2, 1))
    assert sym_err.max() < 1e-6
    eig = np.linalg.eigvalsh(world.covariances)
    assert eig.min() > 0
    # interior bounds sit inside the gaussian extent
    assert np.all(world.bounds_min >= world.means.min(0) - 1e-3)


def test_trajectory_free_space(world):
    poses = sample_trajectory(world, n_frames=24, seed=1)
    assert poses.shape == (24, 4, 4)
    # rotations orthonormal
    r = poses[:, :3, :3]
    eye = np.einsum("nij,nkj->nik", r, r)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-5)
    # positions stay inside the room and outside every inflated furniture box
    pos = poses[:, :3, 3]
    assert np.all(pos[:, [0, 2]] >= world.bounds_min[[0, 2]] - 0.16)
    assert np.all(pos[:, [0, 2]] <= world.bounds_max[[0, 2]] + 0.16)
    for bmin, bmax in world.boxes:
        inside = np.all(
            (pos[:, [0, 2]] > bmin[[0, 2]] + 0.05)
            & (pos[:, [0, 2]] < bmax[[0, 2]] - 0.05),
            axis=1,
        )
        assert not inside.any()
    # non-degenerate baseline (the dataset filter requires movement)
    assert np.linalg.norm(pos[-1] - pos[0]) > 0.3 or (
        np.linalg.norm(np.diff(pos, axis=0), axis=-1).sum() > 1.0
    )


def test_cube_stitch_matches_direct_erp(world):
    """The reference's render-6-faces-then-stitch dataflow must agree with the
    native direct-ERP render away from the poles (where the coarse test
    resolution dominates the stitch interpolation error)."""
    poses = sample_trajectory(world, n_frames=2, seed=2)[:1]
    shape = (32, 64)
    erp = _render_frames(world, poses, shape, via_cubes=False, far=30.0)[0]
    cub = _render_frames(world, poses, shape, via_cubes=True, far=30.0)[0]
    band = slice(8, 24)  # central latitudes
    color_err = np.abs(erp[0][band] - cub[0][band]).mean()
    assert color_err < 0.035, color_err
    d_erp = erp[1][band] / np.maximum(erp[2][band], 1e-6)
    d_cub = cub[1][band] / np.maximum(cub[2][band], 1e-6)
    rel = np.abs(d_erp - d_cub) / np.maximum(d_erp, 0.2)
    assert float(np.median(rel)) < 0.05, float(np.median(rel))


def test_generate_scene_roundtrip(tmp_path):
    from splatter360_tpu.data.scene_io import list_scenes, load_scene

    info = generate_scene(
        tmp_path, "train", "proc0", n_frames=6, image_shape=(32, 64),
        seed=5, spacing=0.25, sh_degree=1,
    )
    assert info["n_frames"] == 6
    assert "proc0" in list_scenes(tmp_path, "train")
    data = load_scene(tmp_path, "train", "proc0")
    rgb, depth_m, poses = data["rgb"], data["depth_m"], data["poses"]
    assert rgb.shape == (6, 32, 64, 3) and rgb.dtype == np.uint8
    assert depth_m.shape == (6, 32, 64)
    assert poses.shape == (6, 4, 4)
    # closed room: essentially no depth holes, plausible metric range
    valid = depth_m > 0
    assert valid.mean() > 0.97
    d = depth_m[valid]
    assert 0.1 < d.min() and d.max() < 15.0


def test_scene_consistency_checker(tmp_path):
    """Cross-view RGB-D consistency validation (check_eipipolar.py parity):
    a healthy generated scene passes; corrupting the depth map fails it."""
    from splatter360_tpu.preprocess import generate_scene
    from splatter360_tpu.preprocess.validate import check_scene_consistency
    from splatter360_tpu.data.scene_io import load_scene, save_scene

    generate_scene(tmp_path, "train", "ok0", n_frames=6,
                   image_shape=(48, 96), seed=3)
    stats = check_scene_consistency(tmp_path, "train", "ok0", n_pairs=4)
    assert stats["coverage"] > 0.1
    assert stats["depth_absrel"] < 0.05
    assert stats["color_mae"] < 0.12

    # corrupt: per-frame alternating depth scale -> cross-view reprojection
    # disagrees -> consistency coverage collapses (the checker must catch it)
    data = load_scene(tmp_path, "train", "ok0")
    scale = np.where(np.arange(data["depth_m"].shape[0]) % 2 == 0, 1.0, 1.6)
    bad_depth = (
        data["depth_m"] * scale[:, None, None] * 1000
    ).astype(np.uint16)
    save_scene(tmp_path, "train", "bad0", data["rgb"], bad_depth,
               data["poses"])
    bad = check_scene_consistency(tmp_path, "train", "bad0", n_pairs=4)
    assert bad["coverage"] < stats["coverage"] * 0.5


def test_convert_reference_scene_layout(tmp_path):
    """convert_reference_scene ingests the reference generator's exact
    on-disk layout (pano/%05d.png, pano_depth mm PNGs, rotation.npy,
    translation.npy — preprocess/dataset_generation, SURVEY.md §3.4)."""
    import cv2

    from splatter360_tpu.data.scene_io import (
        convert_reference_scene, load_scene,
    )

    src = tmp_path / "rawscene"
    (src / "pano").mkdir(parents=True)
    (src / "pano_depth").mkdir()
    (src / "cubemaps_depth").mkdir()  # present in real data; not consumed
    rng = np.random.default_rng(0)
    n, h, w = 3, 32, 64
    rot = np.tile(np.eye(3, dtype=np.float32), (n, 1, 1))
    trans = rng.normal(0, 0.1, (n, 3)).astype(np.float32)
    np.save(src / "rotation.npy", rot)
    np.save(src / "translation.npy", trans)
    rgbs = rng.integers(0, 255, (n, h, w, 3)).astype(np.uint8)
    deps = rng.integers(500, 8000, (n, h, w)).astype(np.uint16)
    for i in range(n):
        cv2.imwrite(str(src / "pano" / f"{i:05d}.png"),
                    cv2.cvtColor(rgbs[i], cv2.COLOR_RGB2BGR))
        cv2.imwrite(str(src / "pano_depth" / f"{i:05d}.png"), deps[i])

    convert_reference_scene(str(src), tmp_path, "train", "conv0")
    data = load_scene(tmp_path, "train", "conv0")
    np.testing.assert_array_equal(data["rgb"], rgbs)
    np.testing.assert_allclose(data["depth_m"], deps / 1000.0, rtol=1e-6)
    np.testing.assert_allclose(data["poses"][:, :3, 3], trans, atol=1e-6)
