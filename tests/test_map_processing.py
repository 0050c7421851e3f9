import numpy as np

from drivescenegen_tpu.ops import map_processing as mp


def _soup():
    """Two polylines separated by a >1m gap, 8 feature cols."""
    a = np.zeros((5, 8), np.float32)
    a[:, 0] = np.arange(5) * 0.5  # x: 0..2, 0.5m spacing
    a[:, 3] = 1.0  # dir_x
    b = np.zeros((3, 8), np.float32)
    b[:, 0] = 10.0 + np.arange(3) * 0.5
    b[:, 1] = 1.0
    b[:, 4] = 1.0  # dir_y
    return np.concatenate([a, b], axis=0)


def test_segmentation_splits_at_gap():
    pieces = mp.segment_points_to_polylines(_soup(), dist_thresh=1.0)
    assert [len(p) for p in pieces] == [5, 3]


def test_segmentation_copies_second_point_dir():
    pts = _soup()
    pts[0, 3:5] = (9.0, 9.0)  # bogus dir on first point
    pieces = mp.segment_points_to_polylines(pts)
    np.testing.assert_array_equal(pieces[0][0, 3:5], pieces[0][1, 3:5])


def test_chunking_shapes_and_masks():
    pts = np.zeros((250, 8), np.float32)
    pts[:, 0] = np.arange(250) * 0.5  # one long continuous line
    feats, masks = mp.generate_batch_polylines_from_map(
        pts, num_points_each_polyline=100
    )
    assert feats.shape == (3, 100, 9) and masks.shape == (3, 100)
    assert masks[0].all() and masks[1].all()
    assert masks[2].sum() == 50
    # Valid column mirrors the mask.
    np.testing.assert_array_equal(feats[..., 8] > 0, masks)


def test_dxdy_normalization_range_and_padding_quirk():
    feats = np.zeros((2, 100, 9), np.float32)
    feats[0, :, 3] = 1.0  # dx=1 everywhere on polyline 0
    feats[0, :, 4] = -1.0
    out = mp.dxdy_normalization(feats, feature_max=0.99)
    # Fit includes the all-zero padding rows: dx spans [0,1] -> 1 maps to 0.99,
    # dy spans [-1,0] -> -1 maps to 0, 0 maps to 0.99.
    np.testing.assert_allclose(out[0, :, 3], 0.99, atol=1e-6)
    np.testing.assert_allclose(out[0, :, 4], 0.0, atol=1e-6)
    np.testing.assert_allclose(out[1, :, 4], 0.99, atol=1e-6)
    assert out[..., 3:5].min() >= 0.0 and out[..., 3:5].max() <= 0.99


def test_transform_translate_only():
    feats = np.zeros((1, 4, 9), np.float32)
    feats[0, :, 0] = 10.0
    feats[0, :, 1] = 5.0
    feats[0, :, 3] = 0.7  # dx must NOT be rotated/changed
    out = mp.transform_scenario(feats, np.array([10.0, 5.0]))
    np.testing.assert_allclose(out[0, :, 0:2], 0.0)
    np.testing.assert_allclose(out[0, :, 3], 0.7)


def test_pad_polylines_budget():
    feats = np.ones((5, 100, 9), np.float32)
    masks = np.ones((5, 100), bool)
    f, m = mp.pad_polylines(feats, masks, 8)
    assert f.shape == (8, 100, 9) and m.shape == (8, 100)
    assert m[:5].all() and not m[5:].any()
    f2, m2 = mp.pad_polylines(feats, masks, 3)  # truncation
    assert f2.shape == (3, 100, 9) and m2.all()


def test_get_polyline_dir_unit_vectors():
    xyz = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0]], np.float32)
    d = mp.get_polyline_dir(xyz)
    np.testing.assert_allclose(d[0], 0.0)
    np.testing.assert_allclose(d[1], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(d[2], [0, 1, 0], atol=1e-6)


def test_point_headings_last_repeated():
    xy = np.array([[0, 0], [1, 0], [2, 1]], np.float32)
    th = mp.point_headings(xy)
    assert th.shape == (3, 1)
    np.testing.assert_allclose(th[0, 0], 0.0, atol=1e-6)
    # insert-at--1 pattern: [t0, t1, t1] -> rows 1 and 2 equal
    np.testing.assert_allclose(th[1, 0], th[2, 0])
