import jax.numpy as jnp
import numpy as np

from drivescenegen_tpu.ops.raster import (
    agent_boxes_from_tracks,
    rasterize_agent_channel,
    rasterize_lane_channels,
    rasterize_scenario,
)


HALF = 40.0  # map_range 80 -> half-range 40 (data_rasterization.py:16)


def _lane_feats(xy_list, dxdy=(0.99, 0.5), lane_type=2.0, P=4, L=100):
    feats = np.zeros((P, L, 9), np.float32)
    masks = np.zeros((P, L), bool)
    n = len(xy_list)
    feats[0, :n, 0:2] = xy_list
    feats[0, :n, 3:5] = dxdy
    feats[0, :, 6] = lane_type
    masks[0, :n] = True
    return jnp.asarray(feats), jnp.asarray(masks)


def test_lane_raster_draws_centerline():
    xs = np.stack([np.linspace(-20, 20, 81), np.zeros(81)], axis=-1)  # y=0 row
    feats, masks = _lane_feats(xs, dxdy=(0.9, 0.4))
    img = np.asarray(rasterize_lane_channels(feats, masks, HALF, H=256, W=256))
    assert img.shape == (256, 256, 2)
    mid = img[127:129, 64:192]  # y=0 -> rows 127/128
    assert (np.abs(mid[..., 0] - 0.9) < 0.05).any(axis=0).all(), "R=dx along line"
    # Background untouched elsewhere.
    np.testing.assert_allclose(img[20, 20], 0.5, atol=1e-6)
    np.testing.assert_allclose(img[200, 200], 0.5, atol=1e-6)


def test_lane_raster_type_filter():
    xs = np.stack([np.linspace(-20, 20, 81), np.zeros(81)], axis=-1)
    for bad_type in (1.0, 3.0, 15.0):  # freeway, bike lane, road edge
        feats, masks = _lane_feats(xs, lane_type=bad_type)
        img = np.asarray(rasterize_lane_channels(feats, masks, HALF))
        np.testing.assert_allclose(img, 0.5, atol=1e-6)


def test_lane_raster_geometry_mapping():
    """World (x, y) -> pixel (row, col): col=(x+40)/80*W, row=(40-y)/80*H."""
    pt = np.array([[10.0, 20.0]])
    feats, masks = _lane_feats(pt, dxdy=(0.99, 0.99))
    img = np.asarray(rasterize_lane_channels(feats, masks, HALF))
    hit = np.argwhere(np.abs(img[..., 0] - 0.5) > 0.05)
    assert len(hit) > 0
    row, col = hit.mean(axis=0)
    assert abs(col - (10.0 + 40) / 80 * 256) < 1.5
    assert abs(row - (40 - 20.0) / 80 * 256) < 1.5


def test_lane_raster_line_is_connected():
    """Diagonal lane must splat into an 8-connected pixel chain (the whole
    point of the analytic rasterizer vs the reference's dotted scatter)."""
    xs = np.stack([np.linspace(-15, 15, 61), np.linspace(-10, 25, 61)], axis=-1)
    feats, masks = _lane_feats(xs)
    img = np.asarray(rasterize_lane_channels(feats, masks, HALF))
    on = np.abs(img[..., 0] - 0.5) > 0.05
    # March along the line: every lit row in the span has a lit neighbor row.
    rows = np.nonzero(on.any(axis=1))[0]
    assert len(rows) > 50
    assert np.diff(np.sort(rows)).max() == 1


def _boxes(entries):
    out = np.zeros((8, 7), np.float32)
    for i, e in enumerate(entries):
        out[i] = e
    return jnp.asarray(out)


def test_agent_raster_gated_on_lanes():
    gate = np.zeros((200, 2), np.float32)
    gate[:100, 0] = np.linspace(-20, 20, 100)  # lane along y=0
    gate_valid = np.zeros((200,), np.float32)
    gate_valid[:100] = 1.0

    on_lane = [0.0, 0.0, 5.0, 2.2, 0.3, 0.6, 1.0]
    off_lane = [0.0, 20.0, 5.0, 2.2, 0.0, 0.6, 1.0]
    img = np.asarray(
        rasterize_agent_channel(
            _boxes([on_lane, off_lane]), jnp.asarray(gate), jnp.asarray(gate_valid), HALF
        )
    )
    assert img.shape == (256, 256)
    # Center box drawn with its blue value.
    assert abs(img[128, 128] - 0.6) < 1e-6
    # Off-lane box (y=20 -> row 64) gated out.
    assert img[64, 128] == 0.0


def test_agent_raster_rotation():
    gate = np.zeros((1, 2), np.float32)
    gate_valid = np.ones((1,), np.float32)
    # 10m x 1m box rotated 90deg: extends along y, not x.
    box = [0.0, 0.0, 10.0, 1.0, np.pi / 2, 0.55, 1.0]
    img = np.asarray(
        rasterize_agent_channel(_boxes([box]), jnp.asarray(gate), jnp.asarray(gate_valid), HALF)
    )
    assert img[128 + 12, 128] > 0.5  # ~3.75m down -> inside length
    assert img[128, 128 + 12] == 0.0  # 3.75m right -> outside width


def test_agent_boxes_from_tracks_reference_semantics():
    trajs = np.zeros((3, 12, 11), np.float32)
    # Agent 0: vehicle moving +x at 10 m/s (1m per 0.1s frame).
    trajs[0, :, 10] = 1
    trajs[0, :, 9] = 1
    trajs[0, :, 0] = np.arange(12) * 1.0
    trajs[0, :, 3] = 4.8
    trajs[0, :, 4] = 2.0
    # Agent 1: pedestrian (type 2) -> excluded.
    trajs[1, :, 10] = 2
    trajs[1, :, 9] = 1
    # Agent 2: vehicle invalid at t=1 -> excluded.
    trajs[2, :, 10] = 1
    boxes = agent_boxes_from_tracks(trajs, max_agents=8, agent_time_index=1)
    assert boxes[0, 6] == 1.0
    np.testing.assert_allclose(boxes[0, 0], 1.0)  # x at t=1
    np.testing.assert_allclose(boxes[0, 5], 1.0 / 60.0 + 0.5, rtol=1e-6)  # blue
    assert boxes[1:, 6].sum() == 0  # others excluded


def _synthetic_scenario():
    """Minimal scenario dict in the reference pickle format."""
    n = 161
    lane = np.zeros((n, 7), np.float32)
    lane[:, 0] = np.linspace(-40, 40, n)  # x
    lane[:, 1] = 5.0  # y = 5
    lane[:, 3] = 1.0  # dir_x
    lane[:, 6] = 2.0  # surface street
    trajs = np.zeros((2, 91, 11), np.float32)
    trajs[0, :, 9] = 1  # sdc valid
    trajs[0, :, 10] = 1
    trajs[0, :, 0] = np.arange(91) * 0.5  # moving +x 5 m/s
    trajs[0, :, 1] = 5.0
    trajs[0, :, 3] = 4.8
    trajs[0, :, 4] = 2.0
    trajs[1] = trajs[0]
    trajs[1, :, 1] = 50.0  # far off-lane vehicle
    return {
        "lane": {0: lane},
        "tracks_info": {"trajs": trajs},
        "sdc_track_index": 0,
    }


def test_rasterize_scenario_end_to_end():
    img = rasterize_scenario(_synthetic_scenario(), img_res=256, map_range=80.0)
    assert img.shape == (256, 256, 3)
    assert img.dtype == np.float32
    # Lane row: world y=5 relative to ego@10 y=5 -> y=0 -> row ~128.
    lane_rows = np.abs(img[..., 0] - 0.5) > 0.05
    assert lane_rows[127:129].any()
    # Agent channel has a filled box near center (sdc on the lane).
    assert (img[..., 2] > 0.5).sum() > 10
    # Off-lane vehicle at y=50-5=45 is outside the gate lines AND range.
    assert img[..., 2].max() <= 1.0
    # Background: gray lanes channels, black agent channel.
    np.testing.assert_allclose(img[10, 10, 0:2], 0.5, atol=1e-6)
    np.testing.assert_allclose(img[10, 10, 2], 0.0, atol=1e-6)
