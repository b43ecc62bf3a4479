"""Pairwise box IoU: axis-aligned and exact rotated (polygon clip), on-device.

The axis-aligned variant matches reference ``compute_axis_aligned_iou``
(utils.py:276-292): boxes are (cx, cy, w, h), heading ignored.

The rotated variant replaces the reference's host-side shapely/GEOS double
loop (utils.py:344-392) with a vmapped Sutherland-Hodgman convex clip that
compiles to XLA and runs entirely on device. Corner convention matches
``_xywha_to_shapely_polygon`` (utils.py:295-341): width along local x,
length along local y, rotated CCW by the yaw angle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_MAX_CLIP_VERTS = 10  # 4-gon clipped by 4 halfplanes yields <= 8 verts; slack for safety.


def axis_aligned_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """IoU matrix [M, N] for boxes (cx, cy, w, h[, ...extra cols ignored]).

    Reference utils.py:276-292 (identical corner math and 1e-7 denominator).
    """
    b1 = boxes1[:, :4]
    b2 = boxes2[:, :4]
    x1a, y1a = b1[:, 0] - b1[:, 2] / 2, b1[:, 1] - b1[:, 3] / 2
    x2a, y2a = b1[:, 0] + b1[:, 2] / 2, b1[:, 1] + b1[:, 3] / 2
    x1b, y1b = b2[:, 0] - b2[:, 2] / 2, b2[:, 1] - b2[:, 3] / 2
    x2b, y2b = b2[:, 0] + b2[:, 2] / 2, b2[:, 1] + b2[:, 3] / 2

    inter_x1 = jnp.maximum(x1a[:, None], x1b[None, :])
    inter_y1 = jnp.maximum(y1a[:, None], y1b[None, :])
    inter_x2 = jnp.minimum(x2a[:, None], x2b[None, :])
    inter_y2 = jnp.minimum(y2a[:, None], y2b[None, :])
    inter = jnp.clip(inter_x2 - inter_x1, 0) * jnp.clip(inter_y2 - inter_y1, 0)
    area1 = b1[:, 2] * b1[:, 3]
    area2 = b2[:, 2] * b2[:, 3]
    union = area1[:, None] + area2[None, :] - inter
    return inter / (union + 1e-7)


def box_corners(box_xywha: jnp.ndarray) -> jnp.ndarray:
    """(..., 5) -> (..., 4, 2) CCW corners; parity with utils.py:295-341."""
    cx, cy, w, l, a = jnp.moveaxis(box_xywha, -1, 0)
    hw, hl = w / 2.0, l / 2.0
    # local CCW corners: (-hw,-hl), (hw,-hl), (hw,hl), (-hw,hl)
    sx = jnp.stack([-hw, hw, hw, -hw], axis=-1)
    sy = jnp.stack([-hl, -hl, hl, hl], axis=-1)
    ca, sa = jnp.cos(a)[..., None], jnp.sin(a)[..., None]
    gx = sx * ca - sy * sa + cx[..., None]
    gy = sx * sa + sy * ca + cy[..., None]
    return jnp.stack([gx, gy], axis=-1)


def _polygon_area(verts: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Shoelace area of first-n vertices of a fixed [MAX, 2] buffer."""
    idx = jnp.arange(_MAX_CLIP_VERTS)
    nxt = jnp.where(idx + 1 >= n, 0, idx + 1)
    x, y = verts[:, 0], verts[:, 1]
    cross = x * y[nxt] - x[nxt] * y
    cross = jnp.where(idx < n, cross, 0.0)
    return 0.5 * jnp.abs(jnp.sum(cross))


def _clip_by_halfplane(poly: jnp.ndarray, n: jnp.ndarray, p1: jnp.ndarray, p2: jnp.ndarray):
    """Clip polygon (first n verts of fixed buffer) by left side of edge p1->p2."""
    edge = p2 - p1

    def side(pt):
        d = pt - p1
        return edge[0] * d[1] - edge[1] * d[0]

    def body(i, carry):
        out, m = carry
        cur = poly[i]
        j = jnp.where(i + 1 >= n, 0, i + 1)
        nxt = poly[j]
        s_cur = side(cur)
        s_nxt = side(nxt)
        cur_in = s_cur >= 0.0
        nxt_in = s_nxt >= 0.0
        denom = s_cur - s_nxt
        t = jnp.where(jnp.abs(denom) > 1e-12, s_cur / jnp.where(denom == 0.0, 1.0, denom), 0.0)
        inter = cur + t * (nxt - cur)

        # crossing in either direction -> emit intersection point first
        crosses = cur_in != nxt_in
        out = jax.lax.cond(
            crosses,
            lambda o: o.at[m].set(inter),
            lambda o: o,
            out,
        )
        m = m + jnp.where(crosses, 1, 0)
        # nxt inside -> emit nxt
        out = jax.lax.cond(
            nxt_in,
            lambda o: o.at[m].set(nxt),
            lambda o: o,
            out,
        )
        m = m + jnp.where(nxt_in, 1, 0)
        return out, m

    out0 = jnp.zeros((_MAX_CLIP_VERTS, 2), dtype=poly.dtype)
    out, m = jax.lax.fori_loop(0, n, body, (out0, jnp.int32(0)))
    return out, m


def _pair_intersection_area(corners1: jnp.ndarray, corners2: jnp.ndarray) -> jnp.ndarray:
    """Intersection area of two convex CCW quads via Sutherland-Hodgman."""
    poly = jnp.zeros((_MAX_CLIP_VERTS, 2), dtype=corners1.dtype).at[:4].set(corners1)
    n = jnp.int32(4)

    def clip_step(k, carry):
        poly, n = carry
        p1 = corners2[k]
        p2 = corners2[(k + 1) % 4]
        poly2, n2 = _clip_by_halfplane(poly, n, p1, p2)
        # empty polygon stays empty
        n2 = jnp.where(n == 0, 0, n2)
        return poly2, n2

    # static 4-edge clipper loop (unrolled; clipper is always a quad)
    for k in range(4):
        poly, n = clip_step(k, (poly, n))
    return _polygon_area(poly, n)


def rotated_iou(boxes1_xywha: jnp.ndarray, boxes2_xywha: jnp.ndarray) -> jnp.ndarray:
    """Exact rotated IoU matrix [M, N], fully on device.

    Behavioural parity with reference ``compute_rotated_iou``
    (utils.py:344-392) incl. its guards: zero-area boxes give 0, intersection
    areas <= 1e-7 give 0, unions <= 1e-6 give 0.
    """
    c1 = box_corners(boxes1_xywha)  # [M, 4, 2]
    c2 = box_corners(boxes2_xywha)  # [N, 4, 2]
    a1 = jnp.abs(boxes1_xywha[:, 2] * boxes1_xywha[:, 3])
    a2 = jnp.abs(boxes2_xywha[:, 2] * boxes2_xywha[:, 3])

    pair = jax.vmap(jax.vmap(_pair_intersection_area, in_axes=(None, 0)), in_axes=(0, None))
    inter = pair(c1, c2)  # [M, N]

    union = a1[:, None] + a2[None, :] - inter
    iou = jnp.where(
        (inter > 1e-7) & (union > 1e-6) & (a1[:, None] >= 1e-6) & (a2[None, :] >= 1e-6),
        inter / jnp.where(union == 0.0, 1.0, union),
        0.0,
    )
    return iou
