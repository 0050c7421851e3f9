import numpy as np

from drivescenegen_tpu.vectorize import curves, graph_utils


def test_cubic_spline_interpolates_knots():
    xs = np.array([0.0, 10.0, 20.0, 30.0])
    ys = np.array([0.0, 5.0, 0.0, -5.0])
    curve = curves.fit_cubic_spline(xs, ys, step=1.0)
    arr = np.array(curve)
    assert arr.shape[1] == 5
    # Passes near each knot.
    for x, y in zip(xs, ys):
        d = np.hypot(arr[:, 0] - x, arr[:, 1] - y).min()
        assert d < 1.0, f"knot ({x},{y}) missed by {d:.2f}"
    # s column is ~1px spaced and ascending.
    assert np.all(np.diff(arr[:, 4]) > 0)


def test_cubic_spline_straight_line_yaw_and_k():
    xs = np.linspace(0, 20, 5)
    ys = np.linspace(0, 20, 5)
    arr = np.array(curves.fit_cubic_spline(xs, ys))
    np.testing.assert_allclose(arr[:, 2], np.pi / 4, atol=1e-6)
    np.testing.assert_allclose(arr[:, 3], 0.0, atol=1e-8)


def test_cubic_spline_circle_curvature():
    t = np.linspace(0, np.pi, 40)
    r = 20.0
    arr = np.array(curves.fit_cubic_spline(r * np.cos(t), r * np.sin(t)))
    # |k| ~ 1/r away from the ends.
    mid = arr[5:-5, 3]
    np.testing.assert_allclose(np.abs(mid), 1.0 / r, rtol=0.15)


def test_cubic_polynomial_matches_cubic_data():
    s = np.linspace(0, 10, 20)
    xs = s
    ys = 0.01 * s**3 - 0.1 * s**2 + s
    arr = np.array(curves.fit_cubic_polynomial(xs, ys))
    for x, y in zip(xs[::5], ys[::5]):
        assert np.hypot(arr[:, 0] - x, arr[:, 1] - y).min() < 0.5


def test_bezier_endpoints_and_tangents():
    n1 = (0.0, 0.0, 0.0)          # at origin pointing +x
    n2 = (20.0, 20.0, np.pi / 2)  # pointing +y
    arr = curves.fit_bezier_curve(n1, n2)
    assert arr.shape[1] == 6
    np.testing.assert_allclose(arr[0, :2], [0, 0], atol=1e-9)
    np.testing.assert_allclose(arr[-1, :2], [20, 20], atol=1e-9)
    np.testing.assert_allclose(arr[0, 2], 0.0, atol=0.1)        # start yaw
    np.testing.assert_allclose(arr[-1, 2], np.pi / 2, atol=1e-9)  # end yaw
    # s column: ascending, last ~ arc length (> straight-line distance).
    assert np.all(np.diff(arr[:, 5]) > 0)
    assert arr[-1, 5] >= np.hypot(20, 20) - 1e-6


def test_bezier_straight_case():
    arr = curves.fit_bezier_curve((0, 0, 0), (30, 0, 0))
    np.testing.assert_allclose(arr[:, 1], 0, atol=1e-9)
    np.testing.assert_allclose(arr[-1, 5], 30.0, rtol=1e-3)


def test_straight_line_reference_semantics():
    xs = np.array([0.0, 1, 2, 3, 4])
    ys = np.array([0.0, 0, 0, 0, 0])
    curve = curves.fit_straight_line(xs, ys)
    arr = np.array(curve)
    assert arr.shape == (5, 5)
    np.testing.assert_allclose(arr[:, 0], xs)
    assert arr[0, 3] == 999999.99  # reference's k sentinel


def test_correct_path_direction_reverses_curve():
    curve = curves.fit_cubic_spline(np.array([0.0, 10, 20]), np.array([0.0, 0, 0]))
    n_start = (0, 0)
    n_end = (20, 0)
    fwd = graph_utils.correct_path_direction(curve, n_start, n_end)
    rev = graph_utils.correct_path_direction(curve, n_end, n_start)
    np.testing.assert_allclose(np.array(fwd)[:, 0], np.array(curve)[:, 0])
    # Reversed: x descending, yaw flipped by pi, s still ascending (quirk).
    arr = np.array(rev)
    assert arr[0, 0] > arr[-1, 0]
    np.testing.assert_allclose(arr[:, 2], np.pi, atol=1e-6)
    assert np.all(np.diff(arr[:, 4]) > 0)


def test_downsample_path_keeps_last():
    path = np.arange(23)[:, None] * np.ones((1, 2))
    out = graph_utils.downsample_path(path, ratio=4)
    np.testing.assert_array_equal(out[-1], path[-1])
    assert out.shape[0] in (6, 7)


def test_calc_path_yaw_diff_opposing():
    # Two edges leaving a node in opposite directions -> diff ~ 0.
    assert graph_utils.calc_path_yaw_diff(0.0, np.pi) < 1e-9
    # Same direction -> diff ~ pi.
    np.testing.assert_allclose(graph_utils.calc_path_yaw_diff(0.0, 0.0), np.pi)
