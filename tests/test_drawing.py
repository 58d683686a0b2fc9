"""Drawing + validation_in_3d figure parity (reference src/visualization/)."""

import numpy as np

from splatter360_tpu.utils.drawing import (
    compute_equal_aabb_with_margin,
    draw_cameras,
    draw_lines,
    draw_points,
    render_cameras,
    render_projections,
)


def test_draw_lines_covers_segment():
    img = np.zeros((32, 64, 3), np.float32)
    out = draw_lines(img, [[4, 16]], [[60, 16]], [[1.0, 0.0, 0.0]], width=3)
    # on-segment pixels are red
    assert out[16, 32, 0] > 0.9 and out[16, 32, 1] < 0.1
    # far-away pixels untouched
    assert np.all(out[2, :, :] == 0.0)
    # antialiased values stay in range
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_draw_points_disc():
    img = np.zeros((16, 32, 3), np.float32)
    out = draw_points(img, [[16, 8]], [[0.0, 1.0, 0.0]], radius=3)
    assert out[8, 16, 1] > 0.9
    assert np.all(out[:, 28:, :] == 0.0)


def test_draw_lines_cap_behavior():
    # horizontal segment from x=10 to x=22 at y=8, width 4 (halfwidth 2)
    img = np.zeros((16, 32, 3), np.float32)
    args = ([[10, 8]], [[22, 8]], [[1.0, 1.0, 1.0]])
    butt = draw_lines(img, *args, width=4, cap="butt")
    square = draw_lines(img, *args, width=4, cap="square")
    rnd = draw_lines(img, *args, width=4, cap="round")
    # butt stops AT the endpoint: pixel center x=23.5 is 1.5 px past the end,
    # outside the t-range, so untouched; round/square still cover it.
    assert butt[8, 23, 0] == 0.0
    assert rnd[8, 23, 0] > 0.5 and square[8, 23, 0] > 0.5
    # square extends past round at the cap CORNER (x past end, y off-axis):
    # round's radial distance exceeds halfwidth where square still covers.
    assert square[9, 23, 0] > rnd[9, 23, 0]
    # all caps agree mid-segment
    assert butt[8, 16, 0] > 0.9 and rnd[8, 16, 0] > 0.9


def test_draw_lines_broadcasts_from_colors():
    # one segment, two colors -> two lines (reference lines.py:29-34)
    img = np.zeros((16, 32, 3), np.float32)
    out = draw_lines(img, [[4, 8]], [[28, 8]],
                     [[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]], width=2)
    assert out[8, 16, 0] > 0.9


def test_draw_empty_inputs_noop():
    img = np.full((8, 8, 3), 0.5, np.float32)
    out = draw_lines(img, np.zeros((0, 2)), np.zeros((0, 2)),
                     np.zeros((0, 3)), width=np.zeros((0,)))
    assert np.array_equal(out, img)
    out = draw_points(img, np.zeros((0, 2)), np.zeros((0, 3)),
                      radius=np.zeros((0,)))
    assert np.array_equal(out, img)


def test_aabb_margin_is_cubical():
    mn, mx = compute_equal_aabb_with_margin(
        np.array([0.0, 0.0, 0.0]), np.array([2.0, 1.0, 0.5]), margin=0.0)
    assert np.allclose(mx - mn, 2.0)  # equal span on every axis


def test_draw_cameras_three_panels():
    extr = np.broadcast_to(np.eye(4, dtype=np.float32), (2, 4, 4)).copy()
    extr[1, :3, 3] = [1.0, 0.5, -0.5]
    k = np.array([[0.5, 0, 0.5], [0, 0.5, 0.5], [0, 0, 1]], np.float32)
    out = draw_cameras(64, extr, np.broadcast_to(k, (2, 3, 3)),
                       np.ones((2, 3), np.float32), near=0.1, far=2.0)
    assert out.shape[0] == 3 and out.shape[2] == 64 and out.shape[3] == 3
    assert out.max() > 0.2  # something was drawn
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_render_projections_shapes():
    rng = np.random.default_rng(0)
    n = 200
    means = rng.normal(size=(n, 3)).astype(np.float32)
    eye = np.broadcast_to(np.eye(3, dtype=np.float32) * 1e-3, (n, 3, 3))
    sh = rng.uniform(0.2, 0.8, size=(n, 3, 1)).astype(np.float32)
    op = np.full((n,), 0.8, np.float32)
    out = render_projections(means, eye, sh, op, 48, draw_label=True,
                             extra_label="(test)")
    assert out.shape[0] == 3 and out.shape[2] == 48 and out.shape[3] == 3
    assert out.max() > 0.05  # gaussians visible in at least one panel


def test_render_cameras_from_batch():
    extr = np.broadcast_to(np.eye(4, dtype=np.float32), (1, 2, 4, 4)).copy()
    extr[0, 1, :3, 3] = [0.5, 0.0, 0.3]
    tgt_extr = np.broadcast_to(np.eye(4, dtype=np.float32), (1, 1, 4, 4)).copy()
    tgt_extr[0, 0, :3, 3] = [-0.6, 0.4, 0.1]
    batch = {
        "context": {
            "extrinsics_sphere": extr,
            "near": np.full((1, 2), 0.1, np.float32),
            "far": np.full((1, 2), 5.0, np.float32),
        },
        "target": {
            "extrinsics_sphere": tgt_extr,
            "near": np.full((1, 1), 0.1, np.float32),
            "far": np.full((1, 1), 5.0, np.float32),
        },
    }
    out = render_cameras(batch, 48)
    assert out.shape[0] == 3 and out.shape[3] == 3
    # target camera drawn in red somewhere: red channel exceeds green
    assert (out[..., 0] - out[..., 1]).max() > 0.5
