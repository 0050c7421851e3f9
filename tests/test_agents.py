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
