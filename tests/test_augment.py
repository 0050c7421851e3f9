"""rot180 direction-balancing augmentation (data/augment.py +
data_rasterization --augment rot180).

The augmentation exists to attack the round-4 quality frontier: generated
scenes drop one direction of two-way lane pairs (OrientationR 0.89 vs the
0.0875 roundtrip ceiling, STATUS r4). Rotating every training scene 180°
presents the model with exactly direction-symmetric statistics. These
tests pin the geometric invariants the scheme rests on.
"""

import glob
import pickle
import sys

import numpy as np
import pytest

from drivescenegen_tpu.data.augment import rotate_scenario_180
from drivescenegen_tpu.data.preprocess import decode_scenario
from drivescenegen_tpu.data.synthetic import make_synthetic_scenario


def _scenario(seed=0):
    return decode_scenario(make_synthetic_scenario(seed=seed))


def test_rotate_is_involution_and_pure():
    info = _scenario()
    lane0 = next(iter(info["lane"]))
    orig_lane = np.array(info["lane"][lane0], np.float32, copy=True)
    orig_trajs = np.array(info["tracks_info"]["trajs"], copy=True)

    back = rotate_scenario_180(rotate_scenario_180(info))
    # Exact except float32 arctan2 wrap noise on the angle columns.
    np.testing.assert_allclose(back["lane"][lane0], orig_lane, atol=1e-5)
    np.testing.assert_allclose(
        back["tracks_info"]["trajs"], orig_trajs, atol=1e-5
    )
    # The input is not mutated.
    np.testing.assert_array_equal(np.asarray(info["lane"][lane0]), orig_lane)
    np.testing.assert_array_equal(info["tracks_info"]["trajs"], orig_trajs)


def test_rotation_negates_positions_directions_velocities():
    info = _scenario()
    rot = rotate_scenario_180(info)
    k = next(iter(info["lane"]))
    a, b = np.asarray(info["lane"][k], np.float32), rot["lane"][k]
    np.testing.assert_allclose(b[:, 0:2], -a[:, 0:2])
    np.testing.assert_allclose(b[:, 3:5], -a[:, 3:5])
    np.testing.assert_array_equal(b[:, 6], a[:, 6])  # type untouched
    ta = info["tracks_info"]["trajs"]
    tb = rot["tracks_info"]["trajs"]
    np.testing.assert_allclose(tb[..., 0:2], -ta[..., 0:2])
    np.testing.assert_allclose(tb[..., 7:9], -ta[..., 7:9])
    np.testing.assert_array_equal(tb[..., 9:], ta[..., 9:])  # valid/type
    # Headings flip by pi (compare as unit vectors to dodge wrap).
    np.testing.assert_allclose(
        np.cos(tb[..., 6]), -np.cos(ta[..., 6]), atol=1e-5
    )


def test_rotated_raster_is_pixel_rot180_of_original():
    """The lane mask of the rotated scene's raster IS the rot180 of the
    original's (measured IoU 1.000 at 128px): the splatter's pixel mapping
    is center-symmetric, so the augmentation adds no resampling artifacts."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from drivescenegen_tpu.ops.raster import rasterize_scenario

    for seed in (0, 3):
        info = _scenario(seed)
        a = np.asarray(rasterize_scenario(info, img_res=128))
        b = np.asarray(
            rasterize_scenario(rotate_scenario_180(info), img_res=128)
        )
        ma = np.abs(a - 0.5).max(-1) > 0.1
        mb = np.abs(b - 0.5).max(-1) > 0.1
        mrot = np.rot90(ma, 2)
        union = (mb | mrot).sum()
        assert union > 500  # scene is non-trivial
        iou = (mb & mrot).sum() / union
        assert iou > 0.98


def test_rotated_raster_agents_are_negated_in_metric_space():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from drivescenegen_tpu.ops.raster import rasterize_scenario
    from drivescenegen_tpu.vectorize.agents import extract_agents

    cell = 80.0 / 128.0
    found = 0
    for seed in range(4):
        info = _scenario(seed)
        a = np.clip(np.asarray(rasterize_scenario(info, img_res=128)), 0, 1)
        b = np.clip(
            np.asarray(
                rasterize_scenario(rotate_scenario_180(info), img_res=128)
            ),
            0, 1,
        )
        aa = extract_agents(a.astype(np.float32), None)
        ab = extract_agents(b.astype(np.float32), None)
        assert len(aa) == len(ab)
        if not aa:
            continue
        found += len(aa)
        ca = np.array([[x[0], x[1]] for x in aa])
        cb = np.array([[x[0], x[1]] for x in ab])
        # rot agent center == -original, up to the rot180 pixel-grid
        # half-cell offset (measured 0.88 m = cell*sqrt(2) at 128px).
        d = np.linalg.norm(ca[:, None, :] + cb[None, :, :], axis=-1)
        assert (d.min(axis=1) < 2 * cell * np.sqrt(2) + 1e-6).all()
    assert found >= 3


def test_rasterization_cli_augment_doubles_corpus_with_sidecar(tmp_path):
    """--augment rot180 writes one extra _rot PNG per scenario and the
    rasterization-time sidecar row mapping stays byte-exact (the finalize
    pass verifies sorted-PNG-set equality + random-row PNG-decode parity
    and discards the sidecar on any mismatch)."""
    from drivescenegen_tpu.data.dataset import sidecar_path
    from drivescenegen_tpu.scripts import data_rasterization

    pre = tmp_path / "pre"
    pre.mkdir()
    for i in range(5):
        with open(pre / f"sample_{i}.pkl", "wb") as f:
            pickle.dump(_scenario(i), f)
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text("raster:\n  img_res: 64\n")

    argv = sys.argv
    try:
        sys.argv = ["x", "--load_path", str(pre), "--save_path",
                    str(tmp_path / "ras"), "--cfg_file", str(cfg),
                    "--n_workers", "2", "--save_sidecar",
                    "--augment", "rot180"]
        data_rasterization.main()
    finally:
        sys.argv = argv

    out_dir = str(tmp_path / "ras" / "GT_70k_s80_dxdy_agents_img")
    pngs = sorted(glob.glob(out_dir + "/*.png"))
    assert len(pngs) == 10
    assert sum("_rot" in p for p in pngs) == 5
    expected = sidecar_path(pngs, 64, 3, np.uint8)
    assert list(glob.glob(out_dir + "/.devcache_*.npy")) == [expected]
    m = np.load(expected, mmap_mode="r")
    assert m.shape == (10, 64, 64, 3)
    # Every row filled (gray background means no row is all-zero).
    assert (np.asarray(m).reshape(10, -1).max(axis=1) > 0).all()
