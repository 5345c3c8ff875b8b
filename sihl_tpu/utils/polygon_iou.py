"""IoU between convex quadrilaterals / polygons, in pure JAX.

Parity target: reference ``src/sihl/utils/polygon_iou.py`` (Sutherland–
Hodgman clipping + shoelace area).  Operates on fixed-size vertex buffers so
it is jit/vmap friendly: clipping a convex n-gon against a convex m-gon
yields at most n + m vertices, so we pad to that bound and carry a validity
count.
"""

import jax.numpy as jnp


def polygon_area(vertices: jnp.ndarray, num_valid=None) -> jnp.ndarray:
    """Shoelace area of a polygon (V, 2); supports padded vertex buffers."""
    n = vertices.shape[0]
    if num_valid is None:
        rolled = jnp.roll(vertices, -1, axis=0)
        cross = vertices[:, 0] * rolled[:, 1] - rolled[:, 0] * vertices[:, 1]
        return jnp.abs(jnp.sum(cross)) / 2.0
    idx = jnp.arange(n)
    nxt = jnp.where(idx + 1 >= num_valid, 0, idx + 1)
    rolled = vertices[nxt]
    cross = vertices[:, 0] * rolled[:, 1] - rolled[:, 0] * vertices[:, 1]
    cross = jnp.where(idx < num_valid, cross, 0.0)
    return jnp.abs(jnp.sum(cross)) / 2.0


def _clip_against_edge(poly, count, a, b, max_out):
    """Clip padded polygon (poly, count) against half-plane left of edge a->b."""
    n = poly.shape[0]
    idx = jnp.arange(n)
    nxt = jnp.where(idx + 1 >= count, 0, idx + 1)
    cur = poly
    nxt_v = poly[nxt]

    def side(p):
        return (b[0] - a[0]) * (p[..., 1] - a[1]) - (b[1] - a[1]) * (p[..., 0] - a[0])

    cur_in = side(cur) >= 0
    nxt_in = side(nxt_v) >= 0

    d = nxt_v - cur
    denom = (b[0] - a[0]) * d[:, 1] - (b[1] - a[1]) * d[:, 0]
    t = jnp.where(jnp.abs(denom) > 1e-12, -side(cur) / jnp.where(denom == 0, 1.0, denom), 0.0)
    inter = cur + t[:, None] * d

    # each input edge emits up to 2 points: current vertex (if inside) and
    # the intersection (if the edge crosses the boundary)
    valid_edge = idx < count
    emit_cur = cur_in & valid_edge
    emit_inter = (cur_in != nxt_in) & valid_edge

    out = jnp.zeros((max_out, 2), poly.dtype)
    emit_counts = emit_cur.astype(jnp.int32) + emit_inter.astype(jnp.int32)
    offsets = jnp.cumsum(emit_counts) - emit_counts
    cur_pos = jnp.where(emit_cur, offsets, max_out - 1)
    inter_pos = jnp.where(emit_inter, offsets + emit_cur.astype(jnp.int32), max_out - 1)
    # scatter; invalid writes land on a scratch slot then get masked by count
    out = out.at[cur_pos].set(jnp.where(emit_cur[:, None], cur, 0.0), mode="drop")
    out = out.at[inter_pos].set(jnp.where(emit_inter[:, None], inter, 0.0), mode="drop")
    new_count = jnp.sum(emit_counts)
    # the scratch slot may hold garbage; zero anything beyond the count
    out = jnp.where((jnp.arange(max_out) < new_count)[:, None], out, 0.0)
    return out, new_count


def polygon_intersection(poly1: jnp.ndarray, poly2: jnp.ndarray):
    """Sutherland–Hodgman intersection of two convex polygons.

    Returns (vertices (n1+n2, 2) padded, count).
    """
    n1, n2 = poly1.shape[0], poly2.shape[0]
    max_out = n1 + n2
    out = jnp.zeros((max_out, 2), poly1.dtype).at[:n1].set(poly1)
    count = jnp.asarray(n1, jnp.int32)
    for i in range(n2):
        a = poly2[i]
        b = poly2[(i + 1) % n2]
        out, count = _clip_against_edge(out, count, a, b, max_out)
    return out, count


def polygon_iou(poly1: jnp.ndarray, poly2: jnp.ndarray) -> jnp.ndarray:
    """IoU of two convex polygons given as (V, 2) vertex arrays (CCW or CW)."""
    poly1 = _ensure_ccw(poly1)
    poly2 = _ensure_ccw(poly2)
    inter_v, inter_n = polygon_intersection(poly1, poly2)
    inter = jnp.where(inter_n >= 3, polygon_area(inter_v, inter_n), 0.0)
    union = polygon_area(poly1) + polygon_area(poly2) - inter
    return jnp.where(union > 0, inter / union, 0.0)


def _ensure_ccw(poly: jnp.ndarray) -> jnp.ndarray:
    rolled = jnp.roll(poly, -1, axis=0)
    signed2 = jnp.sum(poly[:, 0] * rolled[:, 1] - rolled[:, 0] * poly[:, 1])
    return jnp.where(signed2 < 0, poly[::-1], poly)
