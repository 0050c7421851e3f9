import numpy as np
import pytest

from drivescenegen_tpu.data.preprocess import decode_scenario
from drivescenegen_tpu.data.synthetic import make_synthetic_scenario
from drivescenegen_tpu.ops.raster import rasterize_scenario
from drivescenegen_tpu.vectorize import graph_legacy, graph_utils


@pytest.mark.parametrize("seed", [0, 1])
def test_legacy_roundtrip_recovers_lanes(seed):
    info = decode_scenario(make_synthetic_scenario(seed=seed))
    img = rasterize_scenario(info, img_res=256, map_range=80.0)
    res = graph_legacy.extract_polylines_from_img(img, map_range=80.0)
    assert res, "legacy vectorizer returned empty"
    lanes, g = res
    assert len(lanes) >= 1
    import networkx as nx

    assert isinstance(g, nx.MultiDiGraph)
    # Lanes are long inlet->outlet chains in world metres.
    rec = np.vstack([np.asarray(l) for l in lanes])
    assert np.abs(rec[:, 0:2]).max() <= 45.0
    # Unit directions.
    norms = np.hypot(rec[:, 3], rec[:, 4])
    np.testing.assert_allclose(norms, 1.0, atol=1e-6)


def test_legacy_blank_image_returns_empty():
    img = np.full((256, 256, 3), 0.5, np.float32)
    assert graph_legacy.extract_polylines_from_img(img, map_range=80.0) == []


def test_connect_small_gaps_bridges_terminals():
    import networkx as nx

    g = nx.MultiGraph()
    # Two collinear segments with a 3px gap between terminals (12,0) and (15,0).
    path_a = [(float(i), 0.0) for i in range(0, 13)]
    path_b = [(float(i), 0.0) for i in range(15, 28)]
    g.add_edge(path_a[0], path_a[-1], path=path_a, d=len(path_a) - 1)
    g.add_edge(path_b[0], path_b[-1], path=path_b, d=len(path_b) - 1)
    terminals = [n for n, d in g.degree if d == 1]
    g2 = graph_utils.connect_small_gaps(g, terminals, thresh=4)
    # A bridged edge now spans both far endpoints.
    spans = [
        {n1, n2} for n1, n2, k in g2.edges(keys=True)
        if {n1, n2} == {(0.0, 0.0), (27.0, 0.0)}
    ]
    assert spans, f"no bridged edge; edges={list(g2.edges())}"


def test_find_node_directions_classification():
    import networkx as nx

    img = np.full((64, 64, 3), 0.5, np.float32)
    # Inlet pixel at (5, 32): color encodes dx>0 (R high), edge heads +x.
    img[32, 5] = [1.0, 0.5, 0.0]
    # Outlet pixel at (60, 32): color encodes flow +x, but the edge leaves
    # the terminal heading -x (into the map) -> terminal is downstream.
    img[32, 60] = [1.0, 0.5, 0.0]
    g = nx.MultiGraph()
    path1 = [(5 + i, 32) for i in range(10)]
    g.add_edge(path1[0], path1[-1], path=path1, d=9)
    path2 = [(60 + i - 9, 32) for i in range(10)]
    g.add_edge((60, 32), (51, 32), path=path2[::-1], d=9)
    inlets, outlets = graph_utils.find_node_directions(g, [(5, 32), (60, 32)], img)
    assert inlets.shape[0] == 1 and tuple(inlets[0, :2]) == (5, 32)
    assert outlets.shape[0] == 1 and tuple(outlets[0, :2]) == (60, 32)
