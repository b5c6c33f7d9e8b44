"""Vectorized geometry kernels over GeomArray batches — pure numpy.

These are the engine's replacements for the shapely-2 ufuncs the reference
leans on (``sgis/geopandas_tools/overlay.py:16-24`` imports area,
intersection, bounds, …).  Everything here is numpy over the ragged
GeomArray layout; there is no per-vertex Python anywhere.

Point-in-polygon is the crossing-number (ray-casting) test; it is written
with the *exact* arithmetic expression that the DuckDB correctness oracles
use, so Spark results and SQL-oracle results agree bit-for-bit even for
degenerate on-edge points:

    crosses = (y1 > py) != (y2 > py)  and  px < (x2-x1)*(py-y1)/(y2-y1) + x1
"""

from __future__ import annotations

import numpy as np

from .wkb import GeomArray, T_LINE, T_POLYGON


# ------------------------------------------------------------------ reduceat
def _seg_reduce(values: np.ndarray, offsets: np.ndarray, how: str) -> np.ndarray:
    """Per-segment reduction of `values` split at `offsets` (len G+1)."""
    if len(values) == 0:
        return np.full(len(offsets) - 1, 0.0 if how == "sum" else np.nan)
    starts = offsets[:-1]
    empty = offsets[:-1] == offsets[1:]
    # pad with the reduction identity so a start index == len(values)
    # (trailing empty segment) is valid without corrupting its neighbour
    ident = {"sum": 0.0, "min": np.inf, "max": -np.inf}[how]
    padded = np.concatenate([values, [ident]])
    if how == "sum":
        out = np.add.reduceat(padded, starts)
    elif how == "min":
        out = np.minimum.reduceat(padded, starts)
    else:
        out = np.maximum.reduceat(padded, starts)
    out = np.where(empty, 0 if how == "sum" else np.nan, out)
    return out


def _ring_to_geom_offsets(ga: GeomArray) -> np.ndarray:
    """coords-offsets per geometry (start vertex index of each geometry)."""
    return ga.ring_offsets[ga.part_offsets[ga.geom_offsets]]


# ------------------------------------------------------------------- bounds
def bounds(ga: GeomArray) -> np.ndarray:
    """(G, 4) [minx, miny, maxx, maxy] per geometry; NaN for empty rows."""
    geom_coord_offsets = _ring_to_geom_offsets(ga).astype(np.int64)
    x, y = ga.coords[:, 0], ga.coords[:, 1]
    return np.column_stack(
        [
            _seg_reduce(x, geom_coord_offsets, "min"),
            _seg_reduce(y, geom_coord_offsets, "min"),
            _seg_reduce(x, geom_coord_offsets, "max"),
            _seg_reduce(y, geom_coord_offsets, "max"),
        ]
    )


def total_bounds(ga: GeomArray) -> tuple[float, float, float, float]:
    if len(ga.coords) == 0:
        return (np.nan, np.nan, np.nan, np.nan)
    return (
        float(ga.coords[:, 0].min()),
        float(ga.coords[:, 1].min()),
        float(ga.coords[:, 0].max()),
        float(ga.coords[:, 1].max()),
    )


# --------------------------------------------------------------------- area
def _ring_signed_areas(ga: GeomArray) -> np.ndarray:
    """Shoelace signed area per ring (R,). Vectorized over all rings."""
    x, y = ga.coords[:, 0], ga.coords[:, 1]
    # cross product terms for consecutive vertex pairs; the pair crossing a
    # ring boundary is invalid and masked out, the closing edge is implicit
    # because rings are stored closed (first == last vertex).
    cross = x[:-1] * y[1:] - x[1:] * y[:-1]
    ring_ids = np.repeat(
        np.arange(ga.n_rings), np.diff(ga.ring_offsets)
    )
    valid = ring_ids[:-1] == ring_ids[1:]
    sums = np.zeros(ga.n_rings, dtype=np.float64)
    np.add.at(sums, ring_ids[:-1][valid], cross[valid])
    return 0.5 * sums


def area(ga: GeomArray) -> np.ndarray:
    """Unsigned area per geometry; holes (any ring after the first of a
    part) subtract.  Matches GEOS convention used throughout the reference
    (``general.py:244`` sort_large_first)."""
    ring_areas = _ring_signed_areas(ga)
    if ga.n_rings:
        is_exterior = np.zeros(ga.n_rings, dtype=bool)
        is_exterior[ga.part_offsets[:-1]] = True
        signed = np.where(is_exterior, np.abs(ring_areas), -np.abs(ring_areas))
    else:
        signed = ring_areas
    # sum rings per geometry (part_offsets[geom_offsets] has G+1 boundaries)
    ring_geom_offsets = ga.part_offsets[ga.geom_offsets].astype(np.int64)
    out = _seg_reduce(signed, ring_geom_offsets, "sum")
    return np.where(ga.types == T_POLYGON, out, 0.0)


# ------------------------------------------------------------------- length
def length(ga: GeomArray) -> np.ndarray:
    """Per-geometry line length (0 for points/polygons, like geopandas
    .length counts polygons' perimeter — reference uses length only on
    lines, we follow lines-only and expose perimeter separately)."""
    d = np.hypot(np.diff(ga.coords[:, 0]), np.diff(ga.coords[:, 1]))
    ring_ids = np.repeat(np.arange(ga.n_rings), np.diff(ga.ring_offsets))
    valid = ring_ids[:-1] == ring_ids[1:]
    ring_len = np.zeros(ga.n_rings, dtype=np.float64)
    if len(d):
        np.add.at(ring_len, ring_ids[:-1][valid], d[valid])
    ring_geom_offsets = ga.part_offsets[ga.geom_offsets].astype(np.int64)
    return _seg_reduce(ring_len, ring_geom_offsets, "sum")


# ----------------------------------------------------------------- centroid
def centroid(ga: GeomArray) -> np.ndarray:
    """(G, 2) centroid per geometry.

    Polygons: area-weighted shoelace centroid (holes subtract).
    Lines: length-weighted midpoint centroid. Points: mean of points.
    Matches GEOS definitions to float64 precision.
    """
    out = np.full((len(ga), 2), np.nan)
    for g in range(len(ga)):
        t = ga.types[g]
        parts = ga.geom_parts(g)
        if not parts:
            continue
        if t == T_POLYGON:
            A, cx, cy = 0.0, 0.0, 0.0
            for rings in parts:
                for i, r in enumerate(rings):
                    x, y = r[:, 0], r[:, 1]
                    cross = x[:-1] * y[1:] - x[1:] * y[:-1]
                    a = 0.5 * cross.sum()
                    sign = 1.0 if i == 0 else -1.0
                    a_abs = sign * abs(a)
                    if a == 0:
                        continue
                    # orient-independent: scale by signed area then flip
                    gx = ((x[:-1] + x[1:]) * cross).sum() / (6.0 * a)
                    gy = ((y[:-1] + y[1:]) * cross).sum() / (6.0 * a)
                    A += a_abs
                    cx += gx * a_abs
                    cy += gy * a_abs
            if A != 0:
                out[g] = (cx / A, cy / A)
        elif t == T_LINE:
            L, cx, cy = 0.0, 0.0, 0.0
            for rings in parts:
                r = rings[0]
                seg = np.hypot(np.diff(r[:, 0]), np.diff(r[:, 1]))
                mid = 0.5 * (r[:-1] + r[1:])
                L += seg.sum()
                cx += (mid[:, 0] * seg).sum()
                cy += (mid[:, 1] * seg).sum()
            if L != 0:
                out[g] = (cx / L, cy / L)
        else:
            pts = np.concatenate([rings[0] for rings in parts])
            out[g] = pts.mean(axis=0)
    return out


# ------------------------------------------------------------ ring plumbing
def polygon_edge_table(ga: GeomArray, row_ids: np.ndarray | None = None):
    """Flatten polygon batch into an edge table for vectorized PIP.

    Returns (edge_geom_id, x1, y1, x2, y2) — one row per directed edge of
    every ring (exterior and holes; crossing-parity PIP needs no
    distinction).  ``edge_geom_id`` maps each edge back to its geometry row
    (or to ``row_ids[g]`` when given).
    """
    xs1, ys1, xs2, ys2, gid = [], [], [], [], []
    for g in range(len(ga)):
        rid = g if row_ids is None else row_ids[g]
        for ring in ga.geom_rings(g):
            if len(ring) < 2:
                continue
            xs1.append(ring[:-1, 0])
            ys1.append(ring[:-1, 1])
            xs2.append(ring[1:, 0])
            ys2.append(ring[1:, 1])
            gid.append(np.full(len(ring) - 1, rid, dtype=np.int64))
    if not xs1:
        z = np.empty(0)
        return np.empty(0, dtype=np.int64), z, z, z, z
    return (
        np.concatenate(gid),
        np.concatenate(xs1),
        np.concatenate(ys1),
        np.concatenate(xs2),
        np.concatenate(ys2),
    )


def points_in_polygon(
    px: np.ndarray,
    py: np.ndarray,
    edges: tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray],
) -> np.ndarray:
    """Crossing-parity PIP of many points vs ONE polygon's edge set.

    edges = (x1, y1, x2, y2) arrays.  Vectorized P×E; callers keep E modest
    by pre-bucketing via the cell index.  Uses the identical arithmetic the
    SQL oracle uses (see module docstring).
    """
    x1, y1, x2, y2 = edges
    if len(x1) == 0:
        return np.zeros(len(px), dtype=bool)
    py_c = py[:, None]
    px_c = px[:, None]
    straddle = (y1[None, :] > py_c) != (y2[None, :] > py_c)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = (x2 - x1)[None, :] * (py_c - y1[None, :]) / (y2 - y1)[None, :] + x1[None, :]
    crossings = straddle & (px_c < xint)
    return (crossings.sum(axis=1) % 2).astype(bool)


def points_in_polygon_grouped(
    px: np.ndarray,
    py: np.ndarray,
    poly_keys: np.ndarray,
    edge_table: dict,
) -> np.ndarray:
    """PIP for candidate pairs: point i is tested against polygon
    ``poly_keys[i]``; ``edge_table`` maps key -> (x1, y1, x2, y2).

    Groups pairs by polygon so each polygon's edges are streamed once —
    this is the refine kernel of the spatial join (reference semantics:
    STRtree candidate pairs -> exact predicate,
    ``sgis/geopandas_tools/sfilter.py:46-64``).
    """
    result = np.zeros(len(px), dtype=bool)
    if len(px) == 0:
        return result
    order = np.argsort(poly_keys, kind="stable")
    sorted_keys = poly_keys[order]
    boundaries = np.flatnonzero(np.concatenate([[True], sorted_keys[1:] != sorted_keys[:-1]]))
    boundaries = np.concatenate([boundaries, [len(sorted_keys)]])
    for b in range(len(boundaries) - 1):
        lo, hi = boundaries[b], boundaries[b + 1]
        idx = order[lo:hi]
        key = sorted_keys[lo]
        edges = edge_table.get(key)
        if edges is None:
            continue
        result[idx] = points_in_polygon(px[idx], py[idx], edges)
    return result


def point_to_edges_dist2(
    px: np.ndarray,
    py: np.ndarray,
    edges: tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray],
) -> np.ndarray:
    """Min SQUARED distance from each point to a polygon's edge set —
    written with the exact clamp/dot expression the SQL oracle uses, so
    `dist2 <= d*d` agrees bit-for-bit:

        t  = least(greatest(((p-a)·(b-a)) / |b-a|^2, 0), 1)
        dx = px - (ax + t*(bx-ax));  dy = py - (ay + t*(by-ay))
        d2 = dx*dx + dy*dy
    """
    x1, y1, x2, y2 = edges
    abx = (x2 - x1)[None, :]
    aby = (y2 - y1)[None, :]
    apx = px[:, None] - x1[None, :]
    apy = py[:, None] - y1[None, :]
    len2 = abx * abx + aby * aby
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (apx * abx + apy * aby) / len2
    t = np.minimum(np.maximum(np.where(len2 == 0, 0.0, t), 0.0), 1.0)
    dx = apx - t * abx
    dy = apy - t * aby
    return (dx * dx + dy * dy).min(axis=1)


def points_near_polygon_grouped(
    px: np.ndarray,
    py: np.ndarray,
    poly_keys: np.ndarray,
    edge_table: dict,
    max_dist2: float,
) -> np.ndarray:
    """Within-distance predicate for candidate pairs: point i matches
    polygon poly_keys[i] iff inside OR boundary distance² <= max_dist2 —
    the refine kernel of get_neighbor_indices(max_distance=...)
    (reference buffers the left side, ``neighbors.py:101-102``; buffering
    the point by d ≡ distance-d test against the polygon)."""
    result = np.zeros(len(px), dtype=bool)
    if len(px) == 0:
        return result
    order = np.argsort(poly_keys, kind="stable")
    sorted_keys = poly_keys[order]
    boundaries = np.flatnonzero(
        np.concatenate([[True], sorted_keys[1:] != sorted_keys[:-1]])
    )
    boundaries = np.concatenate([boundaries, [len(sorted_keys)]])
    for b in range(len(boundaries) - 1):
        lo, hi = boundaries[b], boundaries[b + 1]
        idx = order[lo:hi]
        edges = edge_table.get(sorted_keys[lo])
        if edges is None:
            continue
        inside = points_in_polygon(px[idx], py[idx], edges)
        near = point_to_edges_dist2(px[idx], py[idx], edges) <= max_dist2
        result[idx] = inside | near
    return result


# -------------------------------------------------------------- distances
def planar_distance(x1, y1, x2, y2) -> np.ndarray:
    """Euclidean distance — written as sqrt of products (not hypot) so the
    SQL oracle expression ``sqrt((x1-x2)*(x1-x2)+(y1-y2)*(y1-y2))``
    produces bit-identical doubles."""
    dx = x1 - x2
    dy = y1 - y2
    return np.sqrt(dx * dx + dy * dy)


def haversine_m(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Great-circle metres on the WGS84 mean sphere (R=6371008.8)."""
    rl1, rl2 = np.radians(lat1), np.radians(lat2)
    dlat = rl2 - rl1
    dlon = np.radians(lon2 - lon1)
    a = np.sin(dlat / 2) ** 2 + np.cos(rl1) * np.cos(rl2) * np.sin(dlon / 2) ** 2
    return 2 * 6371008.8 * np.arcsin(np.sqrt(a))


# ------------------------------------------------------------------ explode
def explode_parts(ga: GeomArray):
    """Yield (geom_row, part_index, rings) for every single part — the
    kernel behind make_all_singlepart (``geometry_types.py:10-22``)."""
    for g in range(len(ga)):
        parts = ga.geom_parts(g)
        for i, rings in enumerate(parts):
            yield g, i, rings


# --------------------------------------------------- simplify / segmentize
def segmentize_ring(ring: np.ndarray, max_len: float) -> np.ndarray:
    """Insert vertices so no segment exceeds ``max_len`` (reference
    shapely.segmentize semantics: every segment is split into
    ``ceil(d / max_len)`` EQUAL subsegments; original vertices are
    preserved exactly).  Fully vectorized: one repeat + one interp pass,
    no per-vertex Python."""
    if len(ring) < 2 or max_len <= 0:
        return ring
    a = ring[:-1]
    b = ring[1:]
    d = np.hypot(b[:, 0] - a[:, 0], b[:, 1] - a[:, 1])
    nsub = np.maximum(np.ceil(d / max_len).astype(np.int64), 1)
    # emit nsub[i] points per segment: a_i + (j/nsub_i) * (b_i - a_i),
    # j = 0..nsub_i-1, then append the final vertex once
    seg_idx = np.repeat(np.arange(len(a)), nsub)
    starts = np.concatenate([[0], np.cumsum(nsub)[:-1]])
    j = np.arange(len(seg_idx)) - np.repeat(starts, nsub)
    frac = j / nsub[seg_idx]
    pts = a[seg_idx] + frac[:, None] * (b[seg_idx] - a[seg_idx])
    return np.concatenate([pts, ring[-1:]], axis=0)


def _dp_keep_mask(ring: np.ndarray, tol: float) -> np.ndarray:
    """Douglas-Peucker keep-mask with endpoints anchored.  The stack loop
    is per-SPLIT (log-depth), the distance test inside it is a
    vectorized perpendicular-distance over the whole sub-span."""
    n = len(ring)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    x = ring[:, 0]
    y = ring[:, 1]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        ax, ay, bx, by = x[i], y[i], x[j], y[j]
        px = x[i + 1 : j]
        py = y[i + 1 : j]
        dx, dy = bx - ax, by - ay
        nrm2 = dx * dx + dy * dy
        if nrm2 == 0.0:
            d2 = (px - ax) ** 2 + (py - ay) ** 2
        else:
            # squared perpendicular distance to the infinite line a-b
            # (GEOS DP uses the line, not the clamped segment)
            cross = dx * (py - ay) - dy * (px - ax)
            d2 = cross * cross / nrm2
        m = int(np.argmax(d2))
        if d2[m] > tol * tol:
            k = i + 1 + m
            keep[k] = True
            stack.append((i, k))
            stack.append((k, j))
    return keep


def simplify_ring(ring: np.ndarray, tol: float, closed: bool) -> np.ndarray:
    """Douglas-Peucker simplification of one ring/line.  Open lines
    anchor both endpoints; closed rings anchor vertex 0 plus the vertex
    farthest from it (the standard ring split), keeping the ring closed.
    Non-topology-preserving, like the reference's shapely.simplify."""
    if tol < 0 or len(ring) <= 2:
        return ring
    if not closed:
        return ring[_dp_keep_mask(ring, tol)]
    # closed: ring[0] == ring[-1]; split at the farthest vertex from 0
    body = ring[:-1]
    if len(body) <= 3:
        return ring
    d2 = (body[:, 0] - body[0, 0]) ** 2 + (body[:, 1] - body[0, 1]) ** 2
    far = int(np.argmax(d2))
    if far == 0:
        return ring
    m1 = _dp_keep_mask(ring[: far + 1], tol)
    m2 = _dp_keep_mask(ring[far:], tol)
    keep = np.zeros(len(ring), dtype=bool)
    keep[: far + 1] = m1
    keep[far:] |= m2
    return ring[keep]
