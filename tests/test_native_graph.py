"""Parity: native C++ path recovery (native/dsg_graph.cpp) vs the Python
reference implementation in vectorize/network.py. The C++ port replicates
iteration order exactly, so paths must be identical, not just equivalent."""

import networkx as nx
import numpy as np
import pytest

from drivescenegen_tpu.vectorize import native_graph, network


def _skeleton_for(seed: int) -> np.ndarray:
    from drivescenegen_tpu.data.preprocess import decode_scenario
    from drivescenegen_tpu.data.synthetic import make_synthetic_scenario
    from drivescenegen_tpu.ops.raster import rasterize_scenario
    from drivescenegen_tpu.ops.morphology import skeletonize
    from drivescenegen_tpu.vectorize.image_utils import get_lane_mask

    info = decode_scenario(make_synthetic_scenario(seed=seed, rich=seed % 2 == 1))
    img = np.asarray(rasterize_scenario(info, img_res=128, map_range=80.0))
    mask = get_lane_mask(img)
    return np.asarray(skeletonize(np.ascontiguousarray(mask.T) > 0))


needs_native = pytest.mark.skipif(
    not native_graph.available(), reason="native dsg_graph unavailable"
)


@needs_native
@pytest.mark.parametrize("seed", [0, 1, 2, 3, 7])
def test_find_paths_parity(seed):
    skel = _skeleton_for(seed)
    nodes = network.detect_nodes(skel)
    nodes = network.add_dense_nodes(nodes, network.find_dense_skeleton_nodes(skel))
    py_paths = [p.path for p in network.find_paths(skel, nodes, 4)]
    cc_paths = native_graph.find_paths(skel, nodes)
    assert len(cc_paths) == len(py_paths)
    for a, b in zip(cc_paths, py_paths):
        assert a == b


@needs_native
@pytest.mark.parametrize("seed", [0, 1, 2, 5, 9])
def test_connect_graph_parity(seed):
    """Full merge loop: the nx graphs must have identical edges+paths."""
    skel = _skeleton_for(seed)
    nodes = network.detect_nodes(skel)
    nodes = network.add_dense_nodes(nodes, network.find_dense_skeleton_nodes(skel))

    # Python reference loop (the fallback body of connect_graph).
    edges = network.find_paths(skel, nodes, 4)
    changed, iters = True, 0
    while changed and iters < 300:
        changed = False
        for edge in edges:
            if len(edge.path) - 1 < 4 and edge.start != edge.stop:
                nodes = network.merge_nodes(nodes, edges, edge.start, edge.stop)
                edges = network.find_paths(skel, nodes, 4)
                changed = True
                iters += 1
                break
    py_g = network.make_graph(edges)

    cc_g = network.connect_graph(skel, 4)  # dispatches to native
    assert isinstance(cc_g, nx.MultiGraph)
    assert sorted(py_g.nodes) == sorted(cc_g.nodes)

    def edge_set(g):
        return sorted(
            (u, v, tuple(d["path"])) for u, v, d in g.edges(data=True)
        )

    assert edge_set(py_g) == edge_set(cc_g)


@needs_native
def test_native_handles_empty_and_degenerate():
    empty = np.zeros((32, 32), np.uint8)
    assert native_graph.find_paths(empty, []) == []
    paths, iters = native_graph.connect_paths(empty, [], 4)
    assert paths == [] and iters == 0
    # single straight line
    line = np.zeros((32, 32), np.uint8)
    line[5:25, 10] = 1
    nodes = network.detect_nodes(line)
    py = [p.path for p in network.find_paths(line, nodes, 4)]
    cc = native_graph.find_paths(line, nodes)
    assert cc == py
