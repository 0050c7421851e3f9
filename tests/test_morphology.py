import numpy as np

from drivescenegen_tpu.ops import morphology as morph


def _thick_line_img(H=64, W=64):
    img = np.zeros((H, W), bool)
    img[30:34, 5:60] = True  # 4-px-thick horizontal bar
    return img


def test_skeletonize_reduces_to_one_px():
    skel = np.asarray(morph.skeletonize(_thick_line_img()))
    assert skel.sum() > 40  # still spans the bar
    # Every column in the interior has exactly one skeleton pixel.
    cols = skel[:, 10:55].sum(axis=0)
    assert cols.max() == 1 and cols.min() == 1


def test_skeletonize_preserves_connectivity():
    skel = np.asarray(morph.skeletonize(_thick_line_img()))
    ys, xs = np.nonzero(skel)
    order = np.argsort(xs)
    xs, ys = xs[order], ys[order]
    # consecutive skeleton pixels are 8-adjacent
    assert np.all(np.abs(np.diff(xs)) <= 1) and np.all(np.abs(np.diff(ys)) <= 1)


def test_skeletonize_idempotent():
    skel = np.asarray(morph.skeletonize(_thick_line_img()))
    skel2 = np.asarray(morph.skeletonize(skel))
    np.testing.assert_array_equal(skel, skel2)


def test_skeletonize_cross_keeps_four_arms():
    img = np.zeros((64, 64), bool)
    img[30:33, 5:60] = True
    img[5:60, 30:33] = True
    skel = np.asarray(morph.skeletonize(img))
    # All four arms still reach out.
    assert skel[31, 5:10].any() and skel[31, 55:60].any()
    assert skel[5:10, 31].any() and skel[55:60, 31].any()


def test_skeletonize_batch():
    imgs = np.stack([_thick_line_img(), _thick_line_img().T])
    out = np.asarray(morph.skeletonize_batch(imgs))
    assert out.shape == imgs.shape
    np.testing.assert_array_equal(out[0].T, out[1])


def test_node_response_endpoints_and_branches():
    img = np.zeros((32, 32), bool)
    img[16, 4:28] = True  # horizontal line
    img[4:16, 16] = True  # vertical stub -> T junction
    A = np.asarray(morph.node_response(img))
    assert A[16, 4] == 1 and A[16, 27] == 1  # endpoints
    assert A[4, 16] == 1
    assert A[16, 16] >= 3  # branch point
    assert A[16, 10] == 2  # mid-line


def test_erosion_2x2():
    img = np.zeros((16, 16), bool)
    img[4:8, 4:8] = True  # 4x4 block
    out = np.asarray(morph.erosion_2x2(img))
    assert out.sum() == 9  # 3x3 surviving positions
    img2 = np.zeros((16, 16), bool)
    img2[4, 4:10] = True  # 1-px line has no 2x2 region
    assert np.asarray(morph.erosion_2x2(img2)).sum() == 0
