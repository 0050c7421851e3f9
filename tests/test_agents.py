import numpy as np

from drivescenegen_tpu.vectorize.agents import (
    estimate_agent_yaw,
    extract_agents,
    verify_vehicle,
)


def _raster_with_agent(cx=128, cy=128, l_px=16, w_px=7, blue=0.6):
    """Gray lane-free raster with one axis-aligned agent box in B."""
    img = np.zeros((256, 256, 3), np.float32)
    img[..., 0] = 0.5
    img[..., 1] = 0.5
    img[cy - w_px // 2 : cy + w_px // 2 + 1,
        cx - l_px // 2 : cx + l_px // 2 + 1, 2] = blue
    return img


def _lane_through(y_world=0.0, yaw=0.0):
    n = 100
    lane = np.zeros((n, 6))
    lane[:, 0] = np.linspace(-40, 40, n)
    lane[:, 1] = y_world
    lane[:, 3] = np.cos(yaw)
    lane[:, 4] = np.sin(yaw)
    return [lane]


def test_extract_agent_box_geometry():
    # 16 px long at 80/256 = 0.3125 m/px -> 5.0 m; 7 px wide -> 2.2 m.
    img = _raster_with_agent()
    agents = extract_agents(img, _lane_through(), map_range=80.0)
    assert len(agents) == 1
    a = agents[0]
    # Center at image center -> world origin.
    assert abs(a[0]) < 0.5 and abs(a[1]) < 0.5
    assert 4.0 <= a[3] <= 5.01  # length clamp
    assert 1.75 <= a[4] <= 2.21  # width clamp


def test_extract_agent_size_gate():
    img = _raster_with_agent(l_px=6, w_px=3)  # 1.9 x 0.9 m -> too small
    agents = extract_agents(img, _lane_through(), map_range=80.0)
    assert agents == []


def test_agent_heading_snapped_to_lane():
    img = _raster_with_agent()
    agents = extract_agents(img, _lane_through(yaw=0.0), map_range=80.0)
    a = agents[0]
    assert abs(a[6]) < 0.1  # snapped to lane yaw 0
    v = np.hypot(a[7], a[8])
    assert 2.0 <= v <= 10.0  # on-lane speed clamp


def test_agent_off_lane_speed_zero():
    img = _raster_with_agent()
    agents = extract_agents(img, _lane_through(y_world=30.0), map_range=80.0)
    a = agents[0]
    assert a[7] == 0.0 and a[8] == 0.0


def test_estimate_agent_yaw_nearest():
    lanes = [_lane_through(0.0, 0.0)[0], _lane_through(10.0, np.pi / 2)[0]]
    yaw, dist = estimate_agent_yaw((0.0, 9.0), lanes)
    np.testing.assert_allclose(yaw, np.pi / 2, atol=1e-6)
    np.testing.assert_allclose(dist, 1.0, atol=0.5)


def test_verify_vehicle_background_returns_zero():
    img = np.full((64, 64, 3), 0.5, np.float32)
    img[..., 2] = 0.0
    g = verify_vehicle(img, 32, 32)
    assert g == [0.0, 0.0, 0.0]


def test_speed_decode_roundtrip():
    """Raster encodes blue = speed_px_frame/60 + 0.5; decoder returns
    |blue-0.5|*60 clamped -> a 6 px/frame agent decodes inside the clamp."""
    img = _raster_with_agent(blue=0.5 + 6.0 / 60.0)
    # Put lane under the agent so the speed survives the on-lane clamp.
    agents = extract_agents(img, _lane_through(), map_range=80.0)
    v = np.hypot(agents[0][7], agents[0][8])
    assert 2.0 <= v <= 10.0


# ---------------------------------------------------------------------------
# Parity vs OpenCV (the library the reference uses, extract_vehicles.py:
# 145-151). cv2 is NOT imported by the package anymore; it is only a test
# oracle here.
# ---------------------------------------------------------------------------

import pytest

cv2 = pytest.importorskip("cv2")

from drivescenegen_tpu.vectorize.agents import connected_components, min_area_rect


def _rotated_box_raster(cx, cy, l_px, w_px, yaw, blue=0.62, res=256):
    img = np.zeros((res, res, 3), np.float32)
    img[..., :2] = 0.5
    yy, xx = np.mgrid[0:res, 0:res]
    dx, dy = xx - cx, yy - cy
    u = dx * np.cos(yaw) + dy * np.sin(yaw)
    v = -dx * np.sin(yaw) + dy * np.cos(yaw)
    img[(np.abs(u) <= l_px / 2) & (np.abs(v) <= w_px / 2), 2] = blue
    return img


@pytest.mark.parametrize("yaw_deg", [0, 17, 45, 60, 90, 133])
def test_min_area_rect_matches_cv2(yaw_deg):
    img = _rotated_box_raster(120.0, 140.0, 18, 8, np.radians(yaw_deg))
    mask = (img[..., 2] * 255).astype(np.uint8)
    comps = connected_components(mask > 100)
    assert len(comps) == 1
    cx, cy, length, width, _ = min_area_rect(comps[0])

    _, thr = cv2.threshold(mask, 100, 255, 0)
    contours, _ = cv2.findContours(thr, cv2.RETR_LIST, cv2.CHAIN_APPROX_SIMPLE)
    assert len(contours) == 1
    (ccx, ccy), (d1, d2), _ = cv2.minAreaRect(contours[0])
    cl, cw = max(d1, d2), min(d1, d2)
    assert abs(cx - ccx) <= 1.0 and abs(cy - ccy) <= 1.0
    assert abs(length - cl) <= 1.5 and abs(width - cw) <= 1.5


def test_extract_agents_parity_with_cv2_pipeline():
    """Full extractor on a multi-agent synthetic raster vs a cv2-based
    re-implementation of the same box stage: same number of agents, same
    centers/sizes within a pixel."""
    import math as m

    from drivescenegen_tpu.vectorize.graph_utils import normalize_angle_rad

    rng = np.random.default_rng(0)
    img = np.zeros((256, 256, 3), np.float32)
    img[..., :2] = 0.5
    placed = []
    for _ in range(6):
        cx, cy = rng.uniform(30, 226, 2)
        if any(np.hypot(cx - a, cy - b) < 40 for a, b in placed):
            continue
        placed.append((cx, cy))
        box = _rotated_box_raster(cx, cy, 17, 8, rng.uniform(0, np.pi))
        img[..., 2] = np.maximum(img[..., 2], box[..., 2])

    ours = extract_agents(img, [], map_range=80.0)

    # cv2 oracle for the box stage with the same gates.
    map_scale = 80.0 / 256
    blue = (img[..., 2] * 255).astype(np.uint8)
    _, thr = cv2.threshold(blue, 100, 255, 0)
    contours, _ = cv2.findContours(thr, cv2.RETR_LIST, cv2.CHAIN_APPROX_SIMPLE)
    boxes = []
    for cnt in contours:
        (ccx, ccy), (d1, d2), _ = cv2.minAreaRect(cnt)
        length, width = max(d1, d2), min(d1, d2)
        if length < 4.0 / map_scale or width < 1.75 / map_scale:
            continue
        boxes.append((ccx, ccy, min(length, 5.0 / map_scale), min(width, 2.2 / map_scale)))

    assert len(ours) == len(boxes) == len(placed)
    # Match by world-converted center.
    map_center = (256 / 2 * map_scale, 256 / 2 * map_scale)
    for ccx, ccy, cl, cw in boxes:
        wx = ccx * map_scale - map_center[0]
        wy = map_center[1] - ccy * map_scale
        d = [np.hypot(a[0] - wx, a[1] - wy) for a in ours]
        a = ours[int(np.argmin(d))]
        assert min(d) < 0.5
        assert abs(a[3] - cl * map_scale) < 0.5
        assert abs(a[4] - cw * map_scale) < 0.5


def test_match_agents_greedy_by_center():
    from drivescenegen_tpu.scripts.eval_cond_agents import match_agents

    gt = [[0, 0, 0, 5, 2, 2, 0, 0, 0], [10, 10, 0, 5, 2, 2, 0, 0, 0]]
    pred = [[0.5, 0, 0, 5, 2, 2, 0, 0, 0], [30, 30, 0, 5, 2, 2, 0, 0, 0]]
    n, err = match_agents(gt, pred)
    assert n == 1 and abs(err - 0.5) < 1e-9
    # Each side is matched at most once even with two close predictions.
    pred2 = [[0.5, 0, 0, 5, 2, 2, 0, 0, 0], [0.6, 0, 0, 5, 2, 2, 0, 0, 0]]
    n2, _ = match_agents([gt[0]], pred2)
    assert n2 == 1
    assert match_agents([], pred) == (0, 0.0)
    assert match_agents(gt, []) == (0, 0.0)


def test_native_128px_raster_agents_extractable():
    """Config-5 protocol invariant: agents in NATIVELY rasterized 128px
    scenes survive the extractor's gates (blue>100 threshold, >=4.0x1.75 m
    physical size). A 256->128 bilinear downscale does NOT — a 1.9 m-wide
    car is 1.5 blurred px, and even a perfect generator roundtrip scores 0
    (measured r4: 0/89 over 32 held-out scenes) — which is why
    configs/config5_cond_128n.yaml rasterizes at native 128 instead of
    resizing the 256px corpus (eval_cond_agents relies on the same)."""
    from drivescenegen_tpu.data.preprocess import decode_scenario
    from drivescenegen_tpu.data.synthetic import make_synthetic_scenario
    from drivescenegen_tpu.ops.raster import rasterize_scenario
    from drivescenegen_tpu.scripts.eval_cond_agents import match_agents

    n128 = n256 = matched = 0
    for seed in range(6):
        info = decode_scenario(make_synthetic_scenario(seed=seed))
        i128 = np.clip(np.asarray(rasterize_scenario(info, img_res=128)), 0, 1)
        i256 = np.clip(np.asarray(rasterize_scenario(info, img_res=256)), 0, 1)
        a128 = extract_agents(i128.astype(np.float32), None)
        a256 = extract_agents(i256.astype(np.float32), None)
        n128 += len(a128)
        n256 += len(a256)
        m, _ = match_agents(a256, a128)
        matched += m
    assert n256 >= 6  # the synthetic scenes do contain visible agents
    # Native-128 extraction keeps >=70% of the native-256 agent set and the
    # survivors match by center within 3 m (r4 measured: 19 vs 18 over 8
    # held-out flagship scenes, 17 cross-matched).
    assert n128 >= 0.7 * n256
    assert matched >= 0.7 * min(n128, n256)
