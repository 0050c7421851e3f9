"""Legacy "GRAPH" vectorizer (reference: vectorization/graph/
image_to_vectors_graph.py, selected via method: "GRAPH").

Not yet implemented in this rebuild — GRAPH_FIT is the published default
(config/vectorization.yaml:7). The reference's SEARCH and DETR methods are
unimplemented stubs there as well (scripts/vectorization.py:45-51).
"""

from __future__ import annotations


def extract_polylines_from_img(img01, map_range: float = 80.0, plot: bool = False,
                               save_path=None, skel=None):
    raise NotImplementedError(
        "GRAPH (legacy) vectorizer is not implemented yet; use GRAPH_FIT"
    )
