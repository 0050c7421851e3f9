import numpy as np

from drivescenegen_tpu.data import vector_map
from drivescenegen_tpu.data.preprocess import decode_scenario
from drivescenegen_tpu.data.synthetic import make_synthetic_scenario


def _poly(xs, ys, ptype=2.0):
    n = len(xs)
    p = np.zeros((n, 8), np.float32)
    p[:, 0] = xs
    p[:, 1] = ys
    d = np.gradient(np.asarray(xs, float)), np.gradient(np.asarray(ys, float))
    norm = np.hypot(d[0], d[1])
    norm[norm == 0] = 1
    p[:, 3] = d[0] / norm
    p[:, 4] = d[1] / norm
    p[:, 6] = ptype
    return p


def test_select_type_polylines_filters_types_and_fov():
    a = _poly(np.arange(0, 30, 0.5), np.zeros(60), ptype=2.0)
    b = _poly(np.arange(100, 110, 0.5), np.zeros(20), ptype=1.0)  # freeway
    soup = np.concatenate([a, b])
    selected, too_less = vector_map.select_type_polylines(
        soup, (2,), filtering=True, filter_distance=20.0
    )
    assert not too_less
    assert len(selected) == 1
    assert selected[0][:, 0].max() <= 20.0


def test_select_type_none_found():
    b = _poly(np.arange(0, 10, 0.5), np.zeros(20), ptype=1.0)
    _, too_less = vector_map.select_type_polylines(b, (2,))
    assert too_less


def test_cut_at_free_endpoint_splits_through_lane():
    # A merging lane ends mid-map at the through lane -> through lane splits.
    through = _poly(np.arange(-40, 40.5, 0.5), np.zeros(161))
    merge_xs = np.arange(-40, -0.25, 0.5)
    merge = _poly(merge_xs, (merge_xs * -0.25) - 10 * 0)  # diagonal into (0, 0)
    merge[:, 1] = np.linspace(-20, 0.3, len(merge_xs))
    out = vector_map.cut_polylines_at_free_endpoints([through, merge], 40.0)
    assert len(out) == 3  # through split into 2 + the merge lane


def test_build_paths_root_to_leaf_chains():
    a = _poly(np.arange(-40, 0.5, 0.5), np.zeros(81))   # root: starts at edge
    b = _poly(np.arange(0, 40.5, 0.5), np.zeros(81))    # leaf: ends at edge
    paths = vector_map.build_paths_root_to_leaf([a, b], 40.0)
    assert len(paths) == 1
    assert paths[0].shape[0] == len(a) + len(b)
    assert paths[0][0, 0] == -40.0 and paths[0][-1, 0] == 40.0


def test_interpolate_polylines_fixed_size():
    a = _poly(np.arange(0, 50, 0.5), np.sin(np.arange(0, 50, 0.5) / 8) * 5)
    out = vector_map.interpolate_polylines([a, a[:2]], n_points=128)
    assert len(out) == 1  # the 2-point one is dropped
    assert out[0].shape == (128, 7)
    # Endpoints preserved.
    np.testing.assert_allclose(out[0][0, 0], a[0, 0], atol=1e-6)
    np.testing.assert_allclose(out[0][-1, 0], a[-1, 0], atol=1e-6)


def test_point_graph_dedupes_shared_points():
    a = _poly(np.arange(0, 10.5, 0.5), np.zeros(21))
    b = a.copy()  # identical -> all points shared
    vertices, edges = vector_map.polylines_to_point_graph([a, b])
    assert len(vertices) == 21
    assert (edges[0] == edges[1]).all()


def test_vector_to_same_size_tensor_on_synthetic():
    info = decode_scenario(make_synthetic_scenario(seed=2))
    tensor, too_less = vector_map.vector_to_same_size_tensor(
        info, des_column_size=128, des_row_size=64, map_range=40.0
    )
    assert tensor.shape == (64, 128, 8)
    assert not too_less
    mask = tensor[..., -1]
    assert mask.max() == 1.0 and mask.min() == 0.0
    # Valid rows have in-FoV coordinates.
    valid = tensor[mask[:, 0] > 0]
    assert np.abs(valid[..., 0:2]).max() <= 40.0 + 1e-3
    # Roundtrip helper.
    polylines, masks = vector_map.tensor_back_to_list(tensor)
    assert len(polylines) == 64 and masks.shape == (64, 128)
