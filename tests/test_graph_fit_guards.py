"""Degenerate-input guards in the GRAPH_FIT passes (the r2 5k run's 6%
'list index out of range' failures; reference image_to_polylines.py:342-485
crashes identically on these inputs — the guards are an improvement, not a
parity break)."""

import networkx as nx
import numpy as np

from drivescenegen_tpu.vectorize.graph_fit import find_intersections, route_is_valid


def _graph_with_stub():
    g = nx.MultiGraph()
    a, b, c = (0, 0), (2, 0), (40, 0)
    g.add_edge(a, b, path=[a, (1, 0), b], d=2)  # 2-px stub -> 1-row spline
    g.add_edge(b, c, path=[(x, 0) for x in range(2, 41)], d=38)
    return g


def test_find_intersections_keeps_degenerate_stub_whole():
    img01 = np.full((64, 64, 3), 0.5, np.float32)
    for direction in (1, -1):
        g = _graph_with_stub()
        tn = np.array([[0, 0, 0.0, 1.0, 0.0, direction]])
        graph, dg = find_intersections(g, img01, tn, length_thresh=25, offset=10)
        # The stub becomes a whole directed lane (no entry/exit cut) instead
        # of raising; the neighbor's long edge survives and is cut normally.
        assert dg.number_of_edges() == 2
        assert (2, 0) in {n for e in dg.edges() for n in e}
        assert graph.number_of_edges() == 2


def test_route_is_valid_handles_missing_neighbor():
    # A 3-node route where the middle node has an edge with an empty path:
    # the yaw vote cannot certify it -> False, not ValueError.
    g = nx.MultiGraph()
    a, b, c = (0, 0), (10, 0), (20, 0)
    g.add_edge(a, b, path=[], d=0)  # empty path -> skipped in the vote
    g.add_edge(b, c, path=[b, (15, 0), c], d=10)
    assert route_is_valid([a, b, c], g) is False
