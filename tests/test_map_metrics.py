import os
import pickle

import networkx as nx
import numpy as np
import pytest

from drivescenegen_tpu.eval import map_metrics


def test_frechet_univariate_identity_and_symmetry():
    assert map_metrics.frechet_distance_univariate(0.0, 1.0, 0.0, 1.0) == pytest.approx(0.0)
    a = map_metrics.frechet_distance_univariate(0.0, 1.0, 2.0, 3.0)
    b = map_metrics.frechet_distance_univariate(2.0, 3.0, 0.0, 1.0)
    assert a == pytest.approx(b)
    assert a > 0


def test_mmd_zero_for_identical_and_positive_for_shifted(rng):
    X = rng.normal(size=(50, 1))
    assert map_metrics.mmd(X, X.copy(), dist_function="wasserstein") == pytest.approx(0.0)
    Y = X + 3.0
    assert map_metrics.mmd(X, Y, dist_function="wasserstein") > 0
    # Plain (biased) MMD^2 variant also behaves.
    assert map_metrics.mmd(X, X.copy()) == pytest.approx(0.0, abs=1e-12)
    assert map_metrics.mmd(X, Y) > 0


def _grid_graph(n=4, spacing=20.0):
    """World-frame n x n grid with 'dist' weights and 'yaw' node attrs."""
    g = nx.Graph()
    for i in range(n):
        for j in range(n):
            g.add_node((i * spacing, j * spacing), yaw=0.1)
    for i in range(n):
        for j in range(n):
            if i + 1 < n:
                g.add_edge((i * spacing, j * spacing), ((i + 1) * spacing, j * spacing),
                           dist=spacing)
            if j + 1 < n:
                g.add_edge((i * spacing, j * spacing), (i * spacing, (j + 1) * spacing),
                           dist=spacing)
    return g


def test_compute_stats_grid_known_values():
    g = _grid_graph(3, 10.0)
    urban, geo, topo = map_metrics.compute_stats(g, map_range=None, map_res=None)
    connectivity, density, reach, convenience = urban
    assert density == 9 and reach == 12
    assert connectivity == pytest.approx(24 / 9)  # mean degree of a 3x3 grid
    # Convenience = mean all-pairs shortest path; manhattan distances on grid.
    assert convenience > 10.0
    assert geo[0] == pytest.approx(10.0)  # mean edge length
    assert geo[1] == pytest.approx(0.1)  # mean yaw
    assert topo[1] > 0  # laplacian spectrum sum


def _two_way_graph(n=40, drop_reverse=False, rotate=0.0, rng=None):
    """A chain road with nodes carrying both travel directions' yaws (theta
    and theta+pi), optionally with the reverse direction dropped — the
    generated-scene failure mode the orientation probe diagnosed."""
    g = nx.Graph()
    rng = rng or np.random.default_rng(0)
    thetas = rng.uniform(-np.pi, np.pi, size=n)
    prev = None
    for i, th in enumerate(thetas):
        fwd = (float(i) * 10.0, 0.0)
        g.add_node(fwd, yaw=float((th + rotate + np.pi) % (2 * np.pi) - np.pi))
        if not drop_reverse:
            rev = (float(i) * 10.0, 1.0)
            back = (th + np.pi + rotate + np.pi) % (2 * np.pi) - np.pi
            g.add_node(rev, yaw=float(back))
            g.add_edge(fwd, rev, dist=1.0)
        if prev is not None:
            g.add_edge(prev, fwd, dist=10.0)
        prev = fwd
    return g


def test_orientation_r_detects_dropped_directions():
    """OrientationR (geo[2]): ~0 for direction-balanced two-way roads, large
    when one direction of each pair is dropped — the signal the signed-mean
    Orientation column (reference parity) can only see through noise."""
    balanced = _two_way_graph(drop_reverse=False)
    dropped = _two_way_graph(drop_reverse=True)
    _, geo_b, _ = map_metrics.compute_stats(balanced, map_range=None, map_res=None)
    _, geo_d, _ = map_metrics.compute_stats(dropped, map_range=None, map_res=None)
    assert geo_b[2] == pytest.approx(0.0, abs=1e-9)  # pairs cancel exactly
    assert geo_d[2] > 0.05  # resultant of n random yaws, no cancellation
    assert geo_d[2] > 10 * geo_b[2] + 0.05


def test_orientation_r_rotation_and_frame_invariant():
    """R is invariant to a global scene rotation and to the world-frame
    transform's yaw sign flip (transform_to_world_frame negates yaws)."""
    g0 = _two_way_graph(drop_reverse=True, rotate=0.0, rng=np.random.default_rng(3))
    g1 = _two_way_graph(drop_reverse=True, rotate=1.234, rng=np.random.default_rng(3))
    _, geo0, _ = map_metrics.compute_stats(g0, map_range=None, map_res=None)
    _, geo1, _ = map_metrics.compute_stats(g1, map_range=None, map_res=None)
    assert geo0[2] == pytest.approx(geo1[2], abs=1e-9)
    # Same graph through the pixel->world transform path (flips yaw signs).
    _, geo_t, _ = map_metrics.compute_stats(g0, map_range=80.0, map_res=256)
    assert geo_t[2] == pytest.approx(geo0[2], abs=1e-9)


def test_metrics_cli_recomputes_stale_stat_cache(tmp_path):
    """A stats.npy cache written before OrientationR existed (6 rows) must be
    recomputed, not returned truncated."""
    import json

    from drivescenegen_tpu.scripts import compute_map_metrics as cli

    for side in ("a", "b"):
        gdir = tmp_path / side / "graph"
        gdir.mkdir(parents=True)
        for i in range(3):
            g = _grid_graph(3, 10.0 + i)
            with open(gdir / f"{i}_graph.pickle", "wb") as f:
                pickle.dump(g, f)
    # Seed a legacy 6-row cache on the gt side (world mode).
    legacy = tmp_path / "a" / "metrics_world"
    legacy.mkdir()
    np.save(legacy / "stats.npy", np.zeros((6, 2)))
    np.save(legacy / "degrees.npy", np.zeros(3))
    np.save(legacy / "spectrum.npy", np.zeros(3))

    out = tmp_path / "m.json"
    cli.main([
        "--gt_dir", str(tmp_path / "a"), "--gen_dir", str(tmp_path / "b"),
        "--gen_world_frame", "--map_range", "80", "--map_res", "256",
        "--num_samples", "3", "--json_out", str(out),
    ])
    with open(out) as f:
        res = json.load(f)
    assert "OrientationR" in res["frechet"]
    assert all(v == 0.0 for v in res["frechet"].values())  # recomputed, not stale zeros vs real
    assert np.load(legacy / "stats.npy").shape[0] == len(map_metrics.STATS_NAMES)


def test_pairwise_distances_match_networkx():
    g = _grid_graph(3, 7.0)
    ours = sorted(map_metrics._pairwise_distances(g))
    ref = []
    nodes = list(g.nodes())
    for i, n1 in enumerate(nodes[:-1]):
        for n2 in nodes[i + 1:]:
            try:
                d, _ = nx.single_source_dijkstra(g, n1, n2, weight="dist")
                ref.append(d)
            except nx.NetworkXNoPath:
                pass
    np.testing.assert_allclose(ours, sorted(ref), rtol=1e-9)


def test_compute_map_stats_and_metrics_roundtrip(tmp_path):
    files = []
    for i in range(6):
        g = _grid_graph(3 + (i % 2), 10.0 + i)
        p = tmp_path / f"{i}_graph.pickle"
        with open(p, "wb") as f:
            pickle.dump(g, f)
        files.append(str(p))

    stats, degrees, spectrum = map_metrics.compute_map_stats(
        files, str(tmp_path / "m"), map_range=None, map_res=None, verbose=False
    )
    assert stats.shape == (len(map_metrics.STATS_NAMES), 2)
    assert degrees.shape == (6,) and spectrum.shape == (6,)
    assert os.path.exists(tmp_path / "m" / "stats.npy")

    # Self-comparison: all Frechet distances ~ 0, MMDs ~ 0.
    fds, mmd_deg, mmd_spec = map_metrics.compute_map_metrics(
        stats, degrees, spectrum, stats, degrees, spectrum, verbose=False
    )
    np.testing.assert_allclose(fds, 0.0, atol=1e-9)
    assert mmd_deg == pytest.approx(0.0)
    assert mmd_spec == pytest.approx(0.0)


def test_graph_export_build_graph():
    from drivescenegen_tpu.data.graph_export import build_graph

    lane = np.zeros((10, 8), np.float32)
    lane[:, 0] = np.arange(10) * 2.0
    centerlines = {1: lane, 2: np.zeros((1, 8), np.float32)}  # 2nd too short
    g = build_graph(centerlines)
    assert g.number_of_edges() == 1
    (n1, n2, data), = g.edges(data=True)
    assert data["dist"] == pytest.approx(18.0)
    assert g.nodes[n1]["yaw"] == pytest.approx(0.0)


def test_end_to_end_metrics_on_synthetic(tmp_path):
    """GT export + gen-side vectorized graphs -> finite metric values."""
    from drivescenegen_tpu.data.graph_export import export_scenario
    from drivescenegen_tpu.data.preprocess import decode_scenario
    from drivescenegen_tpu.data.synthetic import make_synthetic_scenario
    from drivescenegen_tpu.ops.raster import rasterize_scenario
    from drivescenegen_tpu.vectorize.graph_fit import extract_polylines_from_img

    gt_dir = tmp_path / "gt"
    gen_dir = tmp_path / "gen"
    (gen_dir / "graph").mkdir(parents=True)
    for seed in range(3):
        info = decode_scenario(make_synthetic_scenario(seed=seed))
        export_scenario(info, str(gt_dir), seed, save_track=False, save_scenario=False)
        img = rasterize_scenario(info, img_res=256, map_range=80.0)
        lanes, dg = extract_polylines_from_img(img, map_range=80.0)
        with open(gen_dir / "graph" / f"{seed}_graph.pickle", "wb") as f:
            pickle.dump(dg, f)

    import glob as g

    gt_stats = map_metrics.compute_map_stats(
        sorted(g.glob(str(gt_dir / "graph" / "*"))), str(gt_dir / "metrics"),
        map_range=None, map_res=None, verbose=False,
    )
    gen_stats = map_metrics.compute_map_stats(
        sorted(g.glob(str(gen_dir / "graph" / "*"))), str(gen_dir / "metrics"),
        map_range=80.0, map_res=256, verbose=False,
    )
    fds, mmd_deg, mmd_spec = map_metrics.compute_map_metrics(
        *gt_stats, *gen_stats, verbose=False
    )
    assert np.all(np.isfinite(fds))
    assert np.isfinite(mmd_deg) and np.isfinite(mmd_spec)


def test_metrics_cli_gen_world_frame(tmp_path):
    """--gen_world_frame must skip the pixel->world transform: the same
    world-frame graphs on both sides score Frechet == 0 only with the flag."""
    import json

    from drivescenegen_tpu.scripts import compute_map_metrics

    for side in ("a", "b"):
        gdir = tmp_path / side / "graph"
        gdir.mkdir(parents=True)
        for i in range(3):
            g = _grid_graph(3, 10.0 + i)
            with open(gdir / f"{i}_graph.pickle", "wb") as f:
                pickle.dump(g, f)

    out = tmp_path / "m.json"
    compute_map_metrics.main([
        "--gt_dir", str(tmp_path / "a"), "--gen_dir", str(tmp_path / "b"),
        "--gen_world_frame", "--map_range", "80", "--map_res", "256",
        "--num_samples", "3", "--json_out", str(out),
    ])
    with open(out) as f:
        res = json.load(f)
    assert all(v == 0.0 for v in res["frechet"].values())
    assert res["mmd_degrees"] == 0.0
