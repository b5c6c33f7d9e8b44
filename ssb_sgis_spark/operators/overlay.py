"""clean_overlay — distributed spatial set operations, six hows.

Reference: ``sgis/geopandas_tools/overlay.py:31-151`` (`clean_overlay` with
how ∈ intersection/union/identity/symmetric_difference/difference/update,
``overlay.py:69-77``).  The reference's plan is: hygiene → STRtree
candidate pairs → per-how vectorized GEOS kernel → concat + suffix
(``overlay.py:199-257``).  This engine re-expresses each stage Spark-first:

* candidate pairs  = bbox-cell cover join (native `sequence`/`explode` +
  Morton columns; shuffle hash join on the cell key, AQE-skew-safe) with
  the **reference-point dedup** (a pair is kept only in the cell of the
  SW corner of its bbox intersection — exact, no dropDuplicates shuffle),
* per-how kernels  = the arrangement boolean kernel
  (:mod:`..kernels.boolean`) inside Arrow-batched ``mapInPandas`` /
  ``applyInPandas`` (numpy inside; per-pair GEOS calls in the reference
  become per-pair kernel calls here),
* groupby-left union-of-rights for difference
  (``overlay.py:338-345,473-474``) = ``groupBy(left_id).applyInPandas``,
* unmatched-side pass-through (``overlay.py:384-396``) = anti-joins
  unioned back, exactly the reference's ``np.setdiff1d`` logic.

Column semantics follow the reference: collided non-geometry columns get
``lsuffix``/``rsuffix`` (``overlay.py:38-39``); the result geometry is
always column ``geometry``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernels import wkb
from ..kernels.boolean import overlay_parts
from .geomtable import (
    bbox_cells_exploded,
    bbox_overlap_filter,
    pick_pair_resolution,
    reference_cell_filter,
    with_bounds,
)

_BOUNDS = ["minx", "miny", "maxx", "maxy"]
HOWS = (
    "intersection",
    "union",
    "identity",
    "symmetric_difference",
    "difference",
    "update",
)


def _decode_col(pdf, col):
    return wkb.decode(pdf[col].tolist())


def _suffix_plan(df1: DataFrame, df2: DataFrame, geometry_col, lsuffix, rsuffix):
    """Resolve collided column names like the reference (overlay.py:38-39).
    The reserved bound columns (minx..maxy) are derived metadata, not user
    data — they are excluded from the overlay output."""
    left_cols = [c for c in df1.columns if c != geometry_col and c not in _BOUNDS]
    right_cols = [c for c in df2.columns if c != geometry_col and c not in _BOUNDS]
    collide = set(left_cols) & set(right_cols)
    lmap = {c: (c + lsuffix if c in collide else c) for c in left_cols}
    rmap = {c: (c + rsuffix if c in collide else c) for c in right_cols}
    return lmap, rmap


BROADCAST_RIGHT_MAX = 200_000  # right-side rows below this are broadcast


def candidate_pairs(
    df1: DataFrame,
    df2: DataFrame,
    geometry_col: str = "geometry",
    res: int | None = None,
    broadcast_right: bool | None = None,
) -> tuple[DataFrame, int]:
    """The overlay's candidate-pair table: one row per bbox-overlapping
    (left, right) geometry pair.  Left columns keep their names; right
    columns arrive as ``<name>__r``; bounds as minx../minx_2..

    Returns (pairs, res).  Pairs are exact on bbox overlap; geometry
    refinement belongs to the caller's kernel.

    ``broadcast_right=None`` probes the right side's row count (bounded
    scan) and broadcasts it when small — mapInPandas lineage hides size
    stats from AQE, so Catalyst would otherwise pick a shuffle join for a
    361-row grid table (measured 4x slower at sf0.1).
    """
    l = with_bounds(df1, geometry_col)
    r = with_bounds(df2, geometry_col)
    r = r.select(
        *[F.col(c).alias(c + "__r") for c in df2.columns if c not in _BOUNDS],
        *[F.col(b).alias(b + "_2") for b in _BOUNDS],
    )
    if res is None:
        res = pick_pair_resolution(r.selectExpr(
            "minx_2 as minx", "miny_2 as miny", "maxx_2 as maxx", "maxy_2 as maxy"
        ))
    if broadcast_right is None:
        broadcast_right = (
            df2.limit(BROADCAST_RIGHT_MAX + 1).count() <= BROADCAST_RIGHT_MAX
        )
    # spread the left side BEFORE the explode+join: AQE coalesces small
    # upstream shuffles (e.g. a distinct) to 1-2 partitions, which would
    # run the explode, the join AND the downstream geometry kernel
    # single-threaded.  Repartitioning here moves each left geometry once
    # (pre-explode), vs repartitioning the pair table which moves both
    # geometries per candidate pair.  Gated on the static partition
    # count: a well-partitioned left frame (parquet scan, prior overlay
    # in a chain) skips the extra full shuffle of its WKB payload.
    par = df1.sparkSession.sparkContext.defaultParallelism
    if l.rdd.getNumPartitions() < par:
        l = l.repartition(par)
    lc = bbox_cells_exploded(l, res)
    rc = bbox_cells_exploded(
        r, res, minx="minx_2", miny="miny_2", maxx="maxx_2", maxy="maxy_2"
    )
    if broadcast_right:
        rc = F.broadcast(rc)
    pairs = (
        lc.join(rc, "cell")
        .filter(bbox_overlap_filter())
        .filter(reference_cell_filter(res))
        .drop("cell")
    )
    return pairs, res


def _with_left_id(df1, left_id):
    """Stable per-row left id for the groupby-left difference.  Callers at
    scale pass a real unique column; the fallback is
    monotonically_increasing_id, which is stable for deterministic inputs
    (parquet scan + narrow ops) but not across nondeterministic sources."""
    if left_id is not None:
        return df1.withColumn("_lid", F.col(left_id)), True
    # checkpoint pins the generated ids: the pairs and anti-join branches
    # both re-read this frame, and with a nondeterministic source the two
    # recomputations could otherwise assign different ids (dropping or
    # duplicating rows in difference/symdiff/update)
    return (
        df1.withColumn("_lid", F.monotonically_increasing_id()).localCheckpoint(
            eager=True
        ),
        False,
    )


def clean_overlay(
    df1: DataFrame,
    df2: DataFrame,
    how: str = "intersection",
    *,
    geometry_col: str = "geometry",
    lsuffix: str = "_1",
    rsuffix: str = "_2",
    res: int | None = None,
    left_id: str | None = None,
    right_id: str | None = None,
    add_area: bool = False,
    grid_size: float | None = None,
) -> DataFrame:
    """Distributed polygon overlay (reference ``overlay.py:31-151``).

    ``grid_size``: precision quantum forwarded to the boolean kernel
    (reference ``overlay.py:58-60``) — vertices within ``grid_size``
    merge and result slivers below ``grid_size**2`` are dropped.

    ``add_area`` (intersection only): emit an ``area`` column computed
    inside the same kernel batch — the parts are already decoded there, so
    downstream area rollups skip a whole extra Python decode pass.

    ``left_id``/``right_id``: unique id columns used as the groupby key of
    the difference kernels; strongly recommended at scale (see
    :func:`_with_left_id`).
    """
    if how not in HOWS:
        raise ValueError(f"how must be one of {HOWS}, got {how!r}")

    lmap, rmap = _suffix_plan(df1, df2, geometry_col, lsuffix, rsuffix)

    def typed_null(dt):
        return F.lit(None).cast(dt)

    rtypes = {
        rmap[f.name]: f.dataType
        for f in df2.schema.fields
        if f.name != geometry_col and f.name not in _BOUNDS
    }
    ltypes = {
        lmap[f.name]: f.dataType
        for f in df1.schema.fields
        if f.name != geometry_col and f.name not in _BOUNDS
    }

    if how == "intersection":
        return _intersection(df1, df2, geometry_col, lmap, rmap, res, add_area, grid_size)
    if how == "difference":
        return _difference(df1, df2, geometry_col, lmap, res, left_id, grid_size)
    if how == "symmetric_difference":
        return _symdiff(df1, df2, geometry_col, lmap, rmap, res, left_id, right_id, grid_size)
    if how == "union":
        inter = _intersection(df1, df2, geometry_col, lmap, rmap, res, grid_size=grid_size)
        sym = _symdiff(df1, df2, geometry_col, lmap, rmap, res, left_id, right_id, grid_size)
        return inter.unionByName(sym)
    if how == "identity":
        inter = _intersection(df1, df2, geometry_col, lmap, rmap, res, grid_size=grid_size)
        diff = _difference(df1, df2, geometry_col, lmap, res, left_id, grid_size)
        for c, dt in rtypes.items():
            diff = diff.withColumn(c, typed_null(dt))
        return inter.unionByName(diff.select(*inter.columns))
    # update = difference(df1, df2) + df2 rows (overlay.py:260-263)
    diff = _difference(df1, df2, geometry_col, lmap, res, left_id, grid_size)
    d2 = df2.select(
        *[
            F.col(c).alias(lmap.get(c, c))
            for c in df2.columns
            if c != geometry_col and c not in _BOUNDS
        ],
        F.col(geometry_col).alias("geometry"),
    )
    for c in diff.columns:
        if c not in d2.columns:
            d2 = d2.withColumn(c, typed_null(ltypes.get(c, T.StringType())))
    return diff.unionByName(d2.select(*diff.columns))


# ------------------------------------------------------------------ kernels
def _out_schema(df1, df2, geometry_col, lmap, rmap, sides="both"):
    fields = []
    for f in df1.schema.fields:
        if f.name != geometry_col and f.name not in _BOUNDS:
            fields.append(T.StructField(lmap[f.name], f.dataType))
    if sides == "both":
        for f in df2.schema.fields:
            if f.name != geometry_col and f.name not in _BOUNDS:
                fields.append(T.StructField(rmap[f.name], f.dataType))
    fields.append(T.StructField("geometry", T.BinaryType()))
    return T.StructType(fields)


def _detect_boxes(ga):
    """Vectorized axis-aligned-rectangle detection over a GeomArray.

    Returns ``(mask, x0, y0, x1, y1)``; mask rows are single-part,
    single-ring, 5-point closed rectangles whose edges alternate
    x-only / y-only steps.  Everything is numpy on the ragged offset
    arrays — no per-geometry Python.  Boxes are the dominant shape of
    tile/grid/bbox overlays, and their boolean ops are closed-form, so
    detecting them wholesale lets the kernel skip the O(E log E)
    arrangement per pair (measured ~2.5 ms/pair -> ~µs)."""
    n = len(ga)
    mask = np.zeros(n, bool)
    x0 = np.zeros(n)
    y0 = np.zeros(n)
    x1 = np.zeros(n)
    y1 = np.zeros(n)
    if n == 0:
        return mask, x0, y0, x1, y1
    go, po, ro = ga.geom_offsets, ga.part_offsets, ga.ring_offsets
    cand = (go[1:] - go[:-1]) == 1
    p0 = po[go[:-1].clip(0, len(po) - 2)]
    nrings = po[np.minimum(go[:-1] + 1, len(po) - 1)] - p0
    cand &= nrings == 1
    r0 = p0.clip(0, len(ro) - 2)
    cand &= (ro[r0 + 1] - ro[r0]) == 5
    idx = np.flatnonzero(cand)
    if not len(idx):
        return mask, x0, y0, x1, y1
    s = ro[r0[idx]]
    pts = ga.coords[s[:, None] + np.arange(5)]  # (m, 5, 2)
    closed = (pts[:, 0] == pts[:, 4]).all(axis=1)
    xs, ys = pts[:, :4, 0], pts[:, :4, 1]
    bx0, bx1 = xs.min(axis=1), xs.max(axis=1)
    by0, by1 = ys.min(axis=1), ys.max(axis=1)
    on_corner = (
        ((xs == bx0[:, None]) | (xs == bx1[:, None])).all(axis=1)
        & ((ys == by0[:, None]) | (ys == by1[:, None])).all(axis=1)
    )
    stepx = pts[:, 1:, 0] != pts[:, :-1, 0]
    stepy = pts[:, 1:, 1] != pts[:, :-1, 1]
    alternating = (stepx ^ stepy).all(axis=1)
    ok = closed & on_corner & alternating & (bx1 > bx0) & (by1 > by0)
    sel = idx[ok]
    mask[sel] = True
    x0[sel], y0[sel] = bx0[ok], by0[ok]
    x1[sel], y1[sel] = bx1[ok], by1[ok]
    return mask, x0, y0, x1, y1


def _box_ring(x0, y0, x1, y1) -> np.ndarray:
    return np.array(
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=np.float64
    )


def _intersection(df1, df2, geometry_col, lmap, rmap, res, add_area=False, grid_size=None) -> DataFrame:
    pairs, _ = candidate_pairs(df1, df2, geometry_col, res)
    # parallelism comes from candidate_pairs' pre-explode repartition of
    # the left side; a second repartition here would re-shuffle every
    # pair row with BOTH geometry payloads for no extra spread
    schema = _out_schema(df1, df2, geometry_col, lmap, rmap)
    if add_area:
        schema = T.StructType(schema.fields + [T.StructField("area", T.DoubleType())])
    lcols = [c for c in df1.columns if c != geometry_col and c not in _BOUNDS]
    rcols = [c for c in df2.columns if c != geometry_col and c not in _BOUNDS]
    gl, gr = geometry_col, geometry_col + "__r"

    def kernel(it):
        from ..kernels.boolean import polygon_area

        for pdf in it:
            if not len(pdf):
                continue
            # decode each DISTINCT geometry once: candidate pairs repeat
            # the small side's geometries many times (361 grid tiles fan
            # out to ~10^5 pair rows), and the ragged WKB decode was the
            # kernel's main cost, not the boolean op itself
            acodes, auniq = pd.factorize(pdf[gl])
            bcodes, buniq = pd.factorize(pdf[gr])
            ga = wkb.decode(list(auniq))
            gb = wkb.decode(list(buniq))
            # box x box pairs are closed-form (clip rectangles): detect
            # them wholesale and skip the O(E log E) arrangement — the
            # dominant case for tile/grid overlays.  Output coords equal
            # the exact input-coordinate max/min combos the arrangement
            # would emit for axis-aligned crossings.
            am_u, ax0_u, ay0_u, ax1_u, ay1_u = _detect_boxes(ga)
            bm_u, bx0_u, by0_u, bx1_u, by1_u = _detect_boxes(gb)
            both = am_u[acodes] & bm_u[bcodes]
            ix0 = np.maximum(ax0_u[acodes], bx0_u[bcodes])
            iy0 = np.maximum(ay0_u[acodes], by0_u[bcodes])
            ix1 = np.minimum(ax1_u[acodes], bx1_u[bcodes])
            iy1 = np.minimum(ay1_u[acodes], by1_u[bcodes])
            fast = both & (ix0 < ix1) & (iy0 < iy1)
            if grid_size is not None:
                # mirror the kernel's vertex quantum: a box whose width
                # or height is below grid_size has its opposite edges
                # share a connectivity key and degenerates to nothing
                fast &= (ix1 - ix0 >= grid_size) & (iy1 - iy0 >= grid_size)
            fidx = np.flatnonzero(fast)
            keep = list(fidx)
            geoms = wkb.encode_boxes(ix0[fidx], iy0[fidx], ix1[fidx], iy1[fidx])
            areas = (
                list((ix1[fidx] - ix0[fidx]) * (iy1[fidx] - iy0[fidx]))
                if add_area
                else []
            )
            for i in np.flatnonzero(~both):
                out = overlay_parts(
                    [ga.geom_parts(acodes[i])], [gb.geom_parts(bcodes[i])],
                    "intersection", grid_size=grid_size,
                )
                if out:
                    keep.append(i)
                    geoms.append(wkb.encode_geom(out, wkb.T_POLYGON))
                    if add_area:
                        areas.append(polygon_area(out))
            res_pdf = pdf.iloc[keep][
                lcols + [c + "__r" for c in rcols]
            ].copy()
            res_pdf.columns = [lmap[c] for c in lcols] + [rmap[c] for c in rcols]
            res_pdf["geometry"] = geoms
            if add_area:
                res_pdf["area"] = areas
            yield res_pdf

    return pairs.mapInPandas(kernel, schema=schema)


def _difference(df1, df2, geometry_col, lmap, res, left_id=None, grid_size=None) -> DataFrame:
    """df1 minus union of intersecting df2 (groupby-left, reference
    ``overlay.py:338-345``); lefts with no candidates pass through."""
    d1, _ = _with_left_id(df1, left_id)
    pairs, _res = candidate_pairs(d1, df2, geometry_col, res)
    lcols = [c for c in df1.columns if c != geometry_col and c not in _BOUNDS]
    schema = _out_schema(df1, df2, geometry_col, lmap, {}, sides="left")
    gl, gr = geometry_col, geometry_col + "__r"

    grouped_cols = ["_lid"] + lcols + [gl, gr]

    def kernel(key, pdf):
        ga = _decode_col(pdf, gl)
        gb = _decode_col(pdf, gr)
        left_parts = ga.geom_parts(0)
        rights = [gb.geom_parts(i) for i in range(len(pdf))]
        out = overlay_parts([left_parts], rights, "difference", grid_size=grid_size)
        row = pdf.iloc[: 1 if out else 0][lcols].copy()
        row.columns = [lmap[c] for c in lcols]
        row["geometry"] = (
            [wkb.encode_geom(out, wkb.T_POLYGON)] if out else pd.Series(dtype=object)
        )
        return row

    diffed = (
        pairs.select(*grouped_cols)
        .groupBy("_lid")
        .applyInPandas(kernel, schema=schema)
    )
    untouched = d1.join(
        pairs.select("_lid").distinct(), "_lid", "left_anti"
    ).select(
        *[F.col(c).alias(lmap[c]) for c in lcols],
        F.col(geometry_col).alias("geometry"),
    )
    return diffed.unionByName(untouched)


def _symdiff(df1, df2, geometry_col, lmap, rmap, res, left_id=None, right_id=None, grid_size=None) -> DataFrame:
    """(df1 − df2) ∪ (df2 − df1), with the other side's columns null —
    reference ``overlay.py:320-335`` + ``:388-396``."""
    left = _difference(df1, df2, geometry_col, lmap, res, left_id, grid_size)
    right = _difference(df2, df1, geometry_col, dict(rmap), res, right_id, grid_size)
    rtypes = {
        rmap[f.name]: f.dataType
        for f in df2.schema.fields
        if f.name != geometry_col and f.name not in _BOUNDS
    }
    ltypes = {
        lmap[f.name]: f.dataType
        for f in df1.schema.fields
        if f.name != geometry_col and f.name not in _BOUNDS
    }
    for c in rmap.values():
        left = left.withColumn(c, F.lit(None).cast(rtypes[c]))
    for c in lmap.values():
        right = right.withColumn(c, F.lit(None).cast(ltypes[c]))
    cols = [*lmap.values(), *rmap.values(), "geometry"]
    return left.select(*cols).unionByName(right.select(*cols))
