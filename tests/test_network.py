import numpy as np

from drivescenegen_tpu.vectorize import network


def _line_skel(H=64):
    s = np.zeros((H, H), bool)
    s[10:50, 32] = True  # straight 1-px line, [x][y] indexing
    return s


def test_detect_nodes_line_endpoints():
    nodes = network.detect_nodes(_line_skel())
    assert set(nodes) == {(10, 32), (49, 32)}


def test_detect_nodes_t_junction():
    s = _line_skel()
    s[30, 33:50] = True
    nodes = network.detect_nodes(s)
    assert (30, 32) in nodes  # branch point
    assert (10, 32) in nodes and (49, 32) in nodes and (30, 49) in nodes


def test_find_paths_recovers_line():
    s = _line_skel()
    nodes = network.detect_nodes(s)
    paths = network.find_paths(s, nodes)
    assert len(paths) == 1
    p = paths[0]
    assert {p.start, p.stop} == {(10, 32), (49, 32)}
    assert len(p.path) == 40
    # Path is a connected pixel chain.
    arr = np.array(p.path)
    assert np.all(np.abs(np.diff(arr, axis=0)) <= 1)


def test_extract_network_t_junction_graph():
    s = np.zeros((64, 64), bool)
    s[10:55, 32] = True
    s[30, 32:55] = True
    skel, g = network.extract_network(s.astype(np.uint8), min_distance=4)
    # T junction: 3 edges meeting at one degree-3 node.
    degrees = dict(g.degree())
    assert sorted(degrees.values()) == [1, 1, 1, 3]
    assert g.number_of_edges() == 3
    for n1, n2, k in g.edges(keys=True):
        e = g[n1][n2][k]
        assert e["d"] == len(e["path"]) - 1


def test_connect_graph_merges_close_nodes():
    # Two branch points 2px apart -> merged into one node by min_distance=4.
    s = np.zeros((64, 64), bool)
    s[10:50, 32] = True   # main line
    s[30, 32:45] = True   # branch A at x=30
    s[32, 32:45] = True   # branch B at x=32 (2px away)
    skel, g = network.extract_network(s.astype(np.uint8), min_distance=4)
    assert all(len(e["path"]) - 1 >= 4 or n1 == n2 for n1, n2, e in g.edges(data=True))


def test_extract_network_loop():
    # A closed square ring: no endpoints; dense/branch handling must not crash.
    s = np.zeros((64, 64), bool)
    s[20, 20:41] = True
    s[40, 20:41] = True
    s[20:41, 20] = True
    s[20:41, 40] = True
    skel, g = network.extract_network(s.astype(np.uint8), min_distance=4)
    # Ring has no degree-1/3 pixels; graph may be empty — must not crash.
    assert g.number_of_nodes() >= 0


def test_despeckle_culls_small_components_keeps_lanes():
    s = _line_skel()               # 40-px lane component
    s[5, 5] = True                 # 1-px speck
    s[60, 55:58] = True            # 3-px speck
    out = network.despeckle(s, min_px=15)
    assert out[20, 32] and out[10, 32] and out[49, 32]
    assert not out[5, 5] and not out[60, 56]
    assert out.sum() == 40


def test_despeckle_noop_on_clean_skeleton():
    s = _line_skel()
    assert np.array_equal(network.despeckle(s, min_px=15), s)


def test_extract_network_despeckles_by_default():
    s = _line_skel().astype(np.uint8)
    s[5, 5] = 1  # speck would otherwise add an isolated node
    skel, g = network.extract_network(s, min_distance=4)
    assert not skel[5, 5]
    assert sorted(d for _, d in g.degree()) == [1, 1]


def test_find_paths_parallel_arcs_dedup_matches_reference_predicate():
    """Two nodes joined by two disjoint arcs (a ring): find_paths must keep
    BOTH arcs (disjoint interiors) while rejecting re-traced duplicates —
    and the endpoint-indexed dedup must agree with the reference
    _is_new_path predicate decision-for-decision."""
    s = np.zeros((64, 64), bool)
    s[20:45, 20] = True   # west arc
    s[20:45, 40] = True   # east arc
    s[20, 20:41] = True   # north rung
    s[44, 20:41] = True   # south rung
    s[10:20, 30] = True   # north stub -> T-junction at (20, 30)
    s[45:55, 30] = True   # south stub -> T-junction at (44, 30)
    nodes = network.detect_nodes(s)
    assert (20, 30) in nodes and (44, 30) in nodes
    paths = network.find_paths(s, nodes)
    # Every returned path must be accepted by the reference predicate when
    # replayed against the previously accepted ones (the endpoint-indexed
    # dedup agrees with _is_new_path decision-for-decision).
    replay = []
    for p in paths:
        assert network._is_new_path(replay, p)
        replay.append(p)
    # The two junctions are joined both ways around the ring: at least one
    # endpoint pair carries >= 2 paths, and all same-endpoint paths have
    # disjoint interiors (the dedup keeps genuinely parallel arcs).
    from collections import Counter
    pair_counts = Counter((p.start, p.stop) for p in paths)
    assert max(pair_counts.values()) >= 2
    for p in paths:
        interior = set(p.path[1:-1])
        for q in paths:
            if q is not p and q.start == p.start and q.stop == p.stop:
                assert not (interior & set(q.path[1:-1]))
