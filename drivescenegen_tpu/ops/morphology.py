"""Binary image morphology in JAX: Zhang-Suen thinning (the reference's
skimage.morphology.skeletonize slot, extract_network.py:272), neighbor-ring
analysis for node detection (extract_network.py:34-93), and 2x2 erosion for
dense-node detection (extract_network.py:96-103).

The thinning loop is a lax.while_loop of vectorized 3x3 neighborhood ops, so
a whole batch of rasters skeletonizes on-device in one call (vmap).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _shift(img: jax.Array, di: int, dj: int) -> jax.Array:
    """Shift with zero fill: out[i, j] = img[i + di, j + dj]."""
    H, W = img.shape
    padded = jnp.pad(img, 1)
    return jax.lax.dynamic_slice(padded, (1 + di, 1 + dj), (H, W))


def neighbor_ring(img: jax.Array):
    """The 8 neighbors of each pixel in clockwise ring order
    P2..P9 = N, NE, E, SE, S, SW, W, NW (axis-0 = rows/"north")."""
    order = [(-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1)]
    return jnp.stack([_shift(img, di, dj) for di, dj in order])


def transitions_and_sum(ring: jax.Array):
    """A(p): 0->1 transitions around the ring; B(p): neighbor count."""
    nxt = jnp.roll(ring, -1, axis=0)
    A = jnp.sum((ring == 0) & (nxt == 1), axis=0)
    B = jnp.sum(ring, axis=0)
    return A, B


def _thin_subiter(img: jax.Array, first: bool) -> jax.Array:
    ring = neighbor_ring(img)
    P2, P3, P4, P5, P6, P7, P8, P9 = [ring[k] for k in range(8)]
    A, B = transitions_and_sum(ring)
    cond = (img == 1) & (B >= 2) & (B <= 6) & (A == 1)
    if first:
        cond &= (P2 * P4 * P6 == 0) & (P4 * P6 * P8 == 0)
    else:
        cond &= (P2 * P4 * P8 == 0) & (P2 * P6 * P8 == 0)
    return img & ~cond


@jax.jit
def skeletonize(img: jax.Array, max_iters: int = 64) -> jax.Array:
    """Zhang-Suen thinning to a 1-px-wide skeleton. img: [H, W] bool/0-1."""
    img = img.astype(jnp.uint8)

    def body(state):
        img, _, i = state
        out = _thin_subiter(img, True)
        out = _thin_subiter(out, False)
        changed = jnp.any(out != img)
        return out, changed, i + 1

    def cond(state):
        _, changed, i = state
        return changed & (i < max_iters)

    out, _, _ = jax.lax.while_loop(cond, body, (img, jnp.bool_(True), 0))
    return out.astype(jnp.bool_)


skeletonize_batch = jax.jit(jax.vmap(lambda x: skeletonize(x)))


@jax.jit
def node_response(skel: jax.Array) -> jax.Array:
    """A(p) per skeleton pixel (0 elsewhere). Nodes are A==1 (endpoints) or
    A>=3 (branch points) — the reference's check_pixel_neighborhood
    (extract_network.py:59-85)."""
    s = skel.astype(jnp.uint8)
    ring = neighbor_ring(s)
    A, _ = transitions_and_sum(ring)
    return jnp.where(s == 1, A, 0)


@jax.jit
def erosion_2x2(img: jax.Array) -> jax.Array:
    """Binary erosion with a 2x2 structuring element anchored like
    scipy/skimage's origin convention (used for dense skeleton regions)."""
    s = img.astype(jnp.uint8)
    # 2x2 window covering (i-1, j-1)..(i, j): matches skimage
    # binary_erosion(np.pad(x,1), ones((2,2)))[1:-1,1:-1].
    w = (
        s
        & _shift(s, -1, 0)
        & _shift(s, 0, -1)
        & _shift(s, -1, -1)
    )
    return w.astype(jnp.bool_)


@functools.partial(jax.jit, static_argnames=("threshold",))
def binarize_lane_mask(
    img: jax.Array, bg_r: jax.Array, bg_g: jax.Array, threshold: float = 0.1
) -> jax.Array:
    """Lane mask: pixels whose R or G deviates from the background modes by
    more than threshold (the reference's combine_dx_dy, image_utils.py:6-11,
    where 'background' pixels satisfy BOTH |r-mr|<=t and |g-mg|<=t)."""
    r = img[..., 0]
    g = img[..., 1]
    is_bg = (jnp.abs(r - bg_r) <= threshold) & (jnp.abs(g - bg_g) <= threshold)
    return ~is_bg
