"""Native .s3z shard loader: write/read roundtrip + threaded decode."""

import numpy as np
import pytest

from splatter360_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native loader not built"
)


def test_shard_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 255, (6, 32, 64, 3), dtype=np.uint8)
    depth = rng.integers(0, 9000, (6, 32, 64)).astype(np.uint16)
    poses = np.tile(np.eye(4, dtype=np.float32), (6, 1, 1))
    poses[:, :3, 3] = rng.normal(size=(6, 3)).astype(np.float32)

    path = tmp_path / "scene.s3z"
    native.write_shard(path, rgb, depth, poses)
    sh = native.Shard(path)
    assert (sh.n_frames, sh.h, sh.w) == (6, 32, 64)
    np.testing.assert_array_equal(sh.poses(), poses)
    r, d = sh.decode([5, 2, 0])
    np.testing.assert_array_equal(r, rgb[[5, 2, 0]])
    np.testing.assert_array_equal(d, depth[[5, 2, 0]])
    r2, d2 = sh.decode([1], with_depth=False)
    assert d2 is None
    np.testing.assert_array_equal(r2[0], rgb[1])
    sh.close()


def test_shard_bad_index(tmp_path):
    rgb = np.zeros((2, 8, 8, 3), np.uint8)
    depth = np.zeros((2, 8, 8), np.uint16)
    poses = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    path = tmp_path / "s.s3z"
    native.write_shard(path, rgb, depth, poses)
    sh = native.Shard(path)
    with pytest.raises(RuntimeError):
        sh.decode([5])


def test_scene_io_prefers_s3z(tmp_path):
    from splatter360_tpu.data.scene_io import save_scene, load_scene

    rgb = np.random.default_rng(1).integers(0, 255, (3, 16, 32, 3), np.uint8)
    depth = np.zeros((3, 16, 32), np.uint16)
    poses = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
    save_scene(tmp_path, "train", "sc", rgb, depth, poses)
    assert (tmp_path / "train" / "sc.s3z").exists()
    data = load_scene(tmp_path, "train", "sc")
    np.testing.assert_array_equal(data["rgb"], rgb)
