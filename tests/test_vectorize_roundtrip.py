"""Round-trip acceptance tests (SURVEY.md §7 hard part #2): rasterize a
known scenario, vectorize it back, and check the recovered lane geometry,
topology, and flow directions against the ground truth."""

import numpy as np
import pytest

from drivescenegen_tpu.data.preprocess import decode_scenario
from drivescenegen_tpu.data.synthetic import make_synthetic_scenario
from drivescenegen_tpu.ops.raster import rasterize_scenario
from drivescenegen_tpu.vectorize.graph_fit import extract_polylines_from_img


def _gt_lanes_ego_frame(info, map_half=40.0):
    """GT type-2 lane points+dirs in the ego@10 frame, clipped to the map."""
    trajs = info["tracks_info"]["trajs"]
    ego = trajs[info["sdc_track_index"], 10, 0:2]
    out = []
    for lane in info["lane"].values():
        if lane[0, 6] != 2.0:
            continue
        xy = lane[:, 0:2] - ego
        keep = (np.abs(xy) < map_half - 2.0).all(axis=1)
        if keep.sum() > 5:
            out.append(np.concatenate([xy[keep], lane[keep, 3:5]], axis=1))
    return out


def _roundtrip(seed):
    info = decode_scenario(make_synthetic_scenario(seed=seed))
    img = rasterize_scenario(info, img_res=256, map_range=80.0)
    lanes, dg = extract_polylines_from_img(img, map_range=80.0)
    return info, lanes, dg


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_roundtrip_recovers_lane_geometry(seed):
    info, lanes, dg = _roundtrip(seed)
    assert lanes is not None and len(lanes) > 0
    rec = np.vstack([np.asarray(l) for l in lanes])  # [M, 6]

    gt_lanes = _gt_lanes_ego_frame(info)
    assert gt_lanes

    # Recall: most GT points have a recovered lane point within 2.5 m.
    gt_all = np.vstack(gt_lanes)
    d = np.hypot(
        gt_all[:, 0:1] - rec[None, :, 0].reshape(1, -1),
        gt_all[:, 1:2] - rec[None, :, 1].reshape(1, -1),
    ).min(axis=1)
    recall = (d < 2.5).mean()
    assert recall > 0.75, f"lane recall {recall:.2f}"

    # Precision: recovered points lie near some GT lane.
    d2 = np.hypot(
        rec[:, 0:1] - gt_all[None, :, 0].reshape(1, -1),
        rec[:, 1:2] - gt_all[None, :, 1].reshape(1, -1),
    ).min(axis=1)
    precision = (d2 < 2.5).mean()
    assert precision > 0.75, f"lane precision {precision:.2f}"


@pytest.mark.parametrize("seed", [0, 1])
def test_roundtrip_recovers_flow_direction(seed):
    """Matched recovered points must point the same way as the GT lane."""
    info, lanes, dg = _roundtrip(seed)
    gt_all = np.vstack(_gt_lanes_ego_frame(info))  # [N, 4] x,y,dx,dy
    rec = np.vstack([np.asarray(l) for l in lanes])  # [M, 6]

    agree = []
    for p in rec[::5]:
        d = np.hypot(gt_all[:, 0] - p[0], gt_all[:, 1] - p[1])
        j = np.argmin(d)
        if d[j] < 2.0:
            dot = p[3] * gt_all[j, 2] + p[4] * gt_all[j, 3]
            agree.append(dot > 0.5)
    assert len(agree) > 10
    rate = np.mean(agree)
    assert rate > 0.85, f"direction agreement {rate:.2f}"


def test_roundtrip_directed_graph_structure():
    info, lanes, dg = _roundtrip(1)  # crossroads layout
    assert dg.number_of_edges() >= 4
    # Every edge carries a path and a positive length.
    for n1, n2 in dg.edges():
        e = dg[n1][n2]
        assert len(e["path"]) >= 2
        assert e["d"] > 0
    # Node types are from the reference vocabulary.
    types = {dg.nodes[n].get("type") for n in dg.nodes}
    assert types <= {"entry", "exit", "map_entry", "map_exit", None}


def test_blank_image_fails_gracefully():
    img = np.full((256, 256, 3), 0.5, np.float32)
    lanes, dg = extract_polylines_from_img(img, map_range=80.0)
    assert lanes is None and dg is None
