"""Spatial joins: the engine's core (reference: get_neighbor_indices /
sfilter family, ``sgis/geopandas_tools/neighbors.py:19-116``,
``sfilter.py:67-268``).

Physical strategy (Spark-first, designed for the 10^12-page table):

1. Polygon side (municipalities/grids — thousands of rows) is collected,
   decoded once, and turned into a **cell cover**: one row per (cell,
   polygon) at a fixed quadtree resolution.  FULL cells lie entirely
   inside the polygon; PARTIAL cells touch its boundary and carry the
   *cell-clipped ray-cast state*:

   - ``_near``  — edges whose bbox overlaps the cell's x-range; these
     need the full crossing test against the point.
   - ``_rb``    — y-breakpoints inside the cell's y-band from edges
     entirely to the RIGHT of the cell.  For a point in the cell the
     ray-crossing x-condition holds for such edges by construction, and
     sum-of-straddles parity equals (# edge endpoints <= y) mod 2, so
     only endpoint comparisons remain.
   - ``_rbase`` — the constant part of that endpoint count: right-edge
     endpoints below the cell's y-band (same for every point in the
     cell), precomputed at build time.

   Edges entirely left of the cell or outside its y-band can never be
   crossed by the +x ray of a point in the cell and are dropped.  Both
   arrays are PADDED to a fixed per-cover width (degenerate edges /
   +inf breakpoints contribute nothing), so the refine predicate is a
   fixed-size unrolled expression — **whole-stage-codegen JVM code, no
   higher-order functions, no Python**.  The cover is a tiny DataFrame
   and is **broadcast**.

2. Page side gets ``cell = cell_of_xy_col(x, y, res)`` — a native column
   expression (whole-stage codegen; no Python).

3. The entire join is scan → broadcast hash join with the codegen'd
   PIP predicate as the join condition.  One pass, no shuffle of the
   page side, no union, no Python workers.  (Round 1 used an Arrow
   ``mapInPandas`` refine; on many-core hosts the JVM↔Python-worker
   interplay caused scheduler-migration storms and inverted scaling.
   An ``aggregate`` higher-order-function variant was also rejected:
   HOFs are CodegenFallback and de-codegen the whole span.)

This replaces the reference's STRtree candidate-pair generation
(``overlay.py:210-211``) with a shuffle-free broadcast plan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from ..cells import cell_size, covers_for_polygons, cell_of_xy_col, pick_cover_resolution
from ..kernels import wkb
from ..kernels.geom import (
    bounds as geom_bounds,
    points_near_polygon_grouped,
)

# float-rounding guard for the cell-clip edge classification: the oracle's
# crossing-x formula has absolute error <= ~1e-8 for metre-range coords;
# edges within this margin of the cell border take the full (exact) test.
_CLIP_MARGIN = 1e-3

# degenerate padding edge: ay == by means the straddle test is false for
# every y, so padded slots contribute 0 crossings
_PAD_EDGE = (0.0, 0.0, 0.0, 0.0)


def _decode_polygon_side(poly_df: DataFrame, key_col: str, geometry_col: str):
    """Collect + decode the (small) polygon side. Returns
    (keys, GeomArray, edge_table{key -> (x1,y1,x2,y2)})."""
    rows = poly_df.select(key_col, geometry_col).collect()
    keys = [r[0] for r in rows]
    ga = wkb.decode([r[1] for r in rows])
    edge_table = {}
    for g, key in enumerate(keys):
        rings = ga.geom_rings(g)
        if not rings:
            continue
        edge_table[key] = (
            np.concatenate([r[:-1, 0] for r in rings]),
            np.concatenate([r[:-1, 1] for r in rings]),
            np.concatenate([r[1:, 0] for r in rings]),
            np.concatenate([r[1:, 1] for r in rings]),
        )
    return keys, ga, edge_table


_COVER_SCHEMA = StructType(
    [
        StructField("cell", LongType()),
        StructField("_key", BooleanType()),  # placeholder; patched per key dtype
        StructField("_full", BooleanType()),
        StructField("_rbase", LongType()),
        StructField("_rb", ArrayType(DoubleType())),
        StructField(
            "_near",
            ArrayType(
                StructType(
                    [
                        StructField("ax", DoubleType()),
                        StructField("ay", DoubleType()),
                        StructField("bx", DoubleType()),
                        StructField("by", DoubleType()),
                    ]
                )
            ),
        ),
        # sub-cell test box (half-open; ±inf at un-subdivided borders):
        # edge-dense PARTIAL cells are recursively bisected so no single
        # cell can inflate the unrolled predicate width for every row
        StructField("_bx0", DoubleType()),
        StructField("_by0", DoubleType()),
        StructField("_bx1", DoubleType()),
        StructField("_by1", DoubleType()),
    ]
)


def _cover_schema_for(key_example) -> StructType:
    from pyspark.sql.types import LongType as LT, StringType

    if isinstance(key_example, str):
        kt = StringType()
    elif isinstance(key_example, (int, np.integer)):
        kt = LT()
    else:
        kt = StringType()
    fields = list(_COVER_SCHEMA.fields)
    fields[1] = StructField("_key", kt)
    return StructType(fields)


def _cell_box(cell: int, res: int):
    from ..cells import DOMAIN_X0, DOMAIN_Y0

    s = cell_size(res)
    # deinterleave morton -> (ix, iy)
    v = np.uint64(cell)

    def compact(u):
        u = u & np.uint64(0x5555555555555555)
        u = (u | (u >> np.uint64(1))) & np.uint64(0x3333333333333333)
        u = (u | (u >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        u = (u | (u >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
        u = (u | (u >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
        u = (u | (u >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
        return int(u)

    ix = compact(v)
    iy = compact(v >> np.uint64(1))
    x0 = DOMAIN_X0 + ix * s
    y0 = DOMAIN_Y0 + iy * s
    return x0, y0, x0 + s, y0 + s


INF = float("inf")

# codegen-safe bound on the per-row unrolled predicate width: PARTIAL
# cells whose clipped state exceeds this many near edges / breakpoints
# are recursively bisected into sub-cell rows (disjoint half-open test
# boxes, same join key), so ONE edge-dense coastal cell cannot inflate
# the broadcast row width globally or push the generated join condition
# past the JVM/codegen method limits
_MAX_CELL_EDGES = 32
_MAX_SUBDIV_DEPTH = 6


def build_cover_df(spark, keys, ga, res: int, covers=None,
                   max_edges: int = _MAX_CELL_EDGES,
                   max_depth: int = _MAX_SUBDIV_DEPTH):
    """Cover rows with cell-clipped ray-cast state (module docstring).

    Returns ``(cover_df, n_near, n_rb)`` where the two counts are the
    fixed padded widths of the ``_near`` / ``_rb`` arrays (the unrolled
    predicate is generated to exactly that width).

    Edge-dense PARTIAL cells are bisected into sub-cell rows until each
    row's state fits ``max_edges`` (or ``max_depth`` halvings).  Sub-rows
    keep the PARENT cell id as the join key and carry a half-open test
    box ``(_bx0,_by0)..(_bx1,_by1)``; boxes share exact midpoint floats
    and open out to ±inf at un-subdivided borders, so they tile the
    plane exactly — every point matches exactly one sub-row per
    (cell, polygon) regardless of float rounding at the cell border.
    """
    import warnings

    m = _CLIP_MARGIN
    rows = []
    if covers is None:
        covers = covers_for_polygons(ga, res)
    for g, cover, edges in covers:
        key = keys[g]
        for c in cover.full:
            rows.append([int(c), key, True, 0, [], [], -INF, -INF, INF, INF])
        if edges is None or len(cover.partial) == 0:
            continue
        x1, y1, x2, y2 = edges
        exmin = np.minimum(x1, x2)
        exmax = np.maximum(x1, x2)
        eymin = np.minimum(y1, y2)
        eymax = np.maximum(y1, y2)
        for c in cover.partial:
            clip0 = _cell_box(int(c), res)
            # (clip box for edge classification, test box for the join
            # predicate — open at borders not created by a bisection)
            stack = [(clip0, (-INF, -INF, INF, INF), 0)]
            while stack:
                (cx0, cy0, cx1, cy1), tbox, depth = stack.pop()
                band = (eymax > cy0 - m) & (eymin < cy1 + m)
                near = band & (exmax >= cx0 - m) & (exmin <= cx1 + m)
                right = band & (exmin > cx1 + m)
                ni = np.flatnonzero(near)
                ri = np.flatnonzero(right)
                # straddle parity of the right set == (# endpoints <= y)
                # mod 2; endpoints below the band are constant per cell
                bps = np.concatenate([y1[ri], y2[ri]])
                rbase = int((bps <= cy0 - m).sum() % 2)
                in_band = bps[(bps > cy0 - m) & (bps < cy1 + m)]
                # parity-cancel: only (# rb <= y) MOD 2 is used, so
                # breakpoints with equal y cancel pairwise — interior
                # vertices of a contiguous right-edge chain appear exactly
                # twice (end of one edge, start of the next) and vanish,
                # leaving ~2 survivors per chain.  Without this a
                # near-horizontal dense arc (e.g. the top of a 5,000-vertex
                # circle) keeps hundreds of same-y breakpoints in ANY band.
                vals, counts = np.unique(in_band, return_counts=True)
                rb = [float(v) for v, n in zip(vals, counts) if n % 2 == 1]
                if (
                    max(len(ni), len(rb)) > max_edges and depth < max_depth
                ):
                    xm = (cx0 + cx1) / 2.0
                    ym = (cy0 + cy1) / 2.0
                    tx0, ty0, tx1, ty1 = tbox
                    stack += [
                        ((cx0, cy0, xm, ym), (tx0, ty0, xm, ym), depth + 1),
                        ((xm, cy0, cx1, ym), (xm, ty0, tx1, ym), depth + 1),
                        ((cx0, ym, xm, cy1), (tx0, ym, xm, ty1), depth + 1),
                        ((xm, ym, cx1, cy1), (xm, ym, tx1, ty1), depth + 1),
                    ]
                    continue
                if max(len(ni), len(rb)) > max_edges:
                    warnings.warn(
                        f"PIP cover: cell {int(c)} still has "
                        f"{max(len(ni), len(rb))} edges after {max_depth} "
                        f"bisections; unrolled predicate width exceeds "
                        f"{max_edges}"
                    )
                if len(ni) == 0:
                    # boundary does not cross this sub-box (no near edge
                    # within the margin): the whole box is inside iff the
                    # right-set parity at its center is odd
                    cy = (cy0 + cy1) / 2.0
                    parity = (rbase + sum(1 for b in rb if b <= cy)) % 2
                    if parity == 1:
                        rows.append(
                            [int(c), key, True, 0, [], [], *tbox]
                        )
                    continue
                rows.append(
                    [
                        int(c),
                        key,
                        False,
                        rbase,
                        rb,
                        [
                            (float(x1[i]), float(y1[i]), float(x2[i]), float(y2[i]))
                            for i in ni
                        ],
                        *tbox,
                    ]
                )
    n_near = max((len(r[5]) for r in rows), default=0)
    n_rb = max((len(r[4]) for r in rows), default=0)
    for r in rows:
        r[4] = r[4] + [INF] * (n_rb - len(r[4]))
        r[5] = r[5] + [_PAD_EDGE] * (n_near - len(r[5]))
    df = spark.createDataFrame(
        [tuple(r) for r in rows],
        schema=_cover_schema_for(keys[0] if keys else ""),
    )
    return df, n_near, n_rb


def _in_test_box(x: Column, y: Column) -> Column:
    """Half-open sub-cell test box membership (±inf at open borders —
    compares are always true there, so un-subdivided rows pass freely)."""
    return (
        (x >= F.col("_bx0"))
        & (x < F.col("_bx1"))
        & (y >= F.col("_by0"))
        & (y < F.col("_by1"))
    )


def _pip_pred_col(x: Column, y: Column, n_near: int, n_rb: int) -> Column:
    """The PIP predicate as a fixed-width unrolled native expression —
    whole-stage-codegen compatible (no higher-order functions), same
    float64 arithmetic as the numpy kernel (kernels/geom.py:217-226) and
    the DuckDB oracle.  Padded slots contribute 0 by construction.
    Guarded by the sub-cell test box so subdivided cover rows stay
    disjoint (exactly one row matches per point and polygon)."""
    parity = F.col("_rbase")
    for i in range(1, n_rb + 1):
        parity = parity + (F.element_at(F.col("_rb"), i) <= y).cast("long")
    for i in range(1, n_near + 1):
        e = F.element_at(F.col("_near"), i)
        # multiply-then-divide, matching the numpy kernel and the DuckDB
        # oracle's ((x2-x1)*(py-y1))/(y2-y1)+x1 order exactly — a
        # divide-then-multiply form rounds differently and can flip the
        # parity of points within ~1 ulp of an edge crossing
        crossing = ((e["ay"] > y) != (e["by"] > y)) & (
            x
            < F.try_divide((e["bx"] - e["ax"]) * (y - e["ay"]), e["by"] - e["ay"])
            + e["ax"]
        )
        parity = parity + F.when(crossing, F.lit(1)).otherwise(F.lit(0))
    return _in_test_box(x, y) & (F.col("_full") | ((parity % 2) == 1))


# when the enumerated FULL-cell cover would exceed this many rows, switch
# to the compact path: quadtree-block morton ranges broadcast as sorted
# per-level arrays + one vectorized Arrow pass (searchsorted ancestor
# lookup for FULL blocks, numpy ray-cast refine for PARTIAL cells) — the
# north-rule design for county-sized polygons where enumeration explodes
_COMPACT_THRESHOLD = 2_000_000


def _compact_lookup_tables(keys, covers, res):
    """Per-level sorted block arrays + sorted partial-cell array, all
    mapping back to polygon indices."""
    by_level: dict[int, list] = {}
    pcells, pkidx = [], []
    for g, cover, _edges in covers:
        for start, end in cover.full_ranges:
            steps = int((int(end) - int(start)).bit_length() - 1) // 2
            by_level.setdefault(steps, []).append((int(start) >> (2 * steps), g))
        for c in cover.partial:
            pcells.append(int(c))
            pkidx.append(g)
    levels = {}
    for steps, items in by_level.items():
        items.sort()
        levels[steps] = (
            np.array([b for b, _ in items], dtype=np.int64),
            np.array([g for _, g in items], dtype=np.int64),
        )
    order = np.argsort(np.asarray(pcells, dtype=np.int64), kind="stable")
    return (
        levels,
        np.asarray(pcells, dtype=np.int64)[order] if len(pcells) else np.empty(0, np.int64),
        np.asarray(pkidx, dtype=np.int64)[order] if len(pkidx) else np.empty(0, np.int64),
    )


def _span_expand(lo, hi):
    """Vectorized expansion of [lo_i, hi_i) index spans: returns
    (row_idx, flat_idx) pairs for every covered index."""
    span = hi - lo
    sel = np.flatnonzero(span > 0)
    reps = span[sel]
    total = int(reps.sum())
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    ri = np.repeat(sel, reps)
    cs = np.concatenate([[0], np.cumsum(reps)[:-1]])
    fi = np.repeat(lo[sel], reps) + (np.arange(total) - np.repeat(cs, reps))
    return ri, fi


def _pip_join_compact(
    points, keys, ga, edge_table, res, covers,
    key_col, x_col, y_col, how, id_cols,
):
    """Arrow-batched PIP join against a compact (range) cover — used when
    the enumerated cover is too large to broadcast as an equi-join table.
    One mapInPandas pass: numpy cell assignment, per-level searchsorted
    ancestor lookup for FULL blocks, grouped ray-cast refine for PARTIAL
    cells.  No per-row Python (BASELINE.json input_hint)."""
    from ..cells import cell_of_xy_np
    from ..kernels.geom import points_in_polygon_grouped

    spark = points.sparkSession
    levels, pcells, pkidx = _compact_lookup_tables(keys, covers, res)
    keys_arr = np.asarray(keys, dtype=object)
    bc = spark.sparkContext.broadcast((levels, pcells, pkidx, keys_arr, edge_table))

    out_fields = list(points.schema.fields)
    key_dt = _cover_schema_for(keys[0] if keys else "").fields[1].dataType
    out_schema = StructType(out_fields + [StructField(key_col, key_dt)])

    def kernel(it):
        levels_, pcells_, pkidx_, keys_, edges_ = bc.value
        for pdf in it:
            if not len(pdf):
                continue
            x = pdf[x_col].to_numpy(np.float64)
            y = pdf[y_col].to_numpy(np.float64)
            cell = cell_of_xy_np(x, y, res)
            rows, kidx = [], []
            for steps, (blocks, bk) in levels_.items():
                anc = cell >> np.int64(2 * steps)
                lo = np.searchsorted(blocks, anc, "left")
                hi = np.searchsorted(blocks, anc, "right")
                ri, fi = _span_expand(lo, hi)
                rows.append(ri)
                kidx.append(bk[fi])
            lo = np.searchsorted(pcells_, cell, "left")
            hi = np.searchsorted(pcells_, cell, "right")
            ri, fi = _span_expand(lo, hi)
            if len(ri):
                cand_keys = keys_[pkidx_[fi]]
                mask = points_in_polygon_grouped(x[ri], y[ri], cand_keys, edges_)
                rows.append(ri[mask])
                kidx.append(pkidx_[fi][mask])
            if rows:
                ri = np.concatenate(rows)
                gi = np.concatenate(kidx)
            else:
                ri = np.empty(0, np.int64)
                gi = np.empty(0, np.int64)
            out = pdf.iloc[ri].copy()
            out[key_col] = keys_[gi]
            yield out

    matched = points.mapInPandas(kernel, schema=out_schema)
    return _apply_how(points, matched, key_col, how, id_cols)


# bounded cover cache keyed on the polygon frame's *plan* fingerprint
# (semanticHash) + params — a changed polygon frame changes the key, so no
# stale covers (the reference's graph-cache idea, networkanalysis.py:1527-
# 1585, keyed by content there); evicted entries unpersist their cover.
_COVER_CACHE: dict = {}
_COVER_CACHE_MAX = 16


def _cover_cache_put(ck, value):
    if ck[0] is None and ck[1] is None:
        # semanticHash failed AND no explicit cache_key: the key would
        # collapse to (None, None, params) and a second, DIFFERENT polygon
        # frame with the same params would read the first frame's stale
        # cover — skip caching entirely instead
        return
    if len(_COVER_CACHE) >= _COVER_CACHE_MAX:
        # FIFO: evict the OLDEST insertion (dict preserves insertion
        # order; popitem() would evict the newest)
        old = _COVER_CACHE.pop(next(iter(_COVER_CACHE)))
        try:
            if old[0] == "enum":
                old[5].unpersist()
        except Exception:
            pass
    _COVER_CACHE[ck] = value


def points_in_polygons_join(
    points: DataFrame,
    polygons: DataFrame,
    *,
    key_col: str = "muni_id",
    geometry_col: str = "geometry",
    x_col: str = "x",
    y_col: str = "y",
    res: int | None = None,
    how: str = "inner",
    max_distance: float | None = None,
    cache_key: str | None = None,
    id_cols: list[str] | None = None,
    compact_threshold: int | None = None,
) -> DataFrame:
    """Spatial join point-table × polygon-table on ``intersects`` (PIP).

    Returns the point rows with ``key_col`` appended (inner), or with
    a null key for unmatched points (``how="left"``), or only the
    matched/unmatched point rows (``how="semi"`` / ``how="anti"`` —
    the reference's sfilter / sfilter_inverse, ``sfilter.py:67-134,
    209-268``).  ``id_cols`` names a unique key of the point side for the
    semi/anti/left bookkeeping joins (defaults to all point columns).

    Reference parity: get_neighbor_indices(points, polygons,
    predicate="intersects") — ``neighbors.py:19-116``.  With
    ``max_distance`` the predicate becomes "inside OR within
    max_distance of the boundary" (the reference buffers the left side,
    ``neighbors.py:101-102``): candidate cells come from a slightly
    over-buffered cover and every candidate is refined with the exact
    point-to-edge distance kernel.
    """
    spark = points.sparkSession
    # the cover pipeline (collect + decode + quadtree recursion) is serial
    # driver work, ~seconds for thousands of polygons; at real scale it is
    # amortized over the whole job, and repeated invocations against the
    # same polygon frame reuse it via the plan-fingerprint cache
    try:
        fp = polygons.semanticHash()
    except Exception:
        fp = cache_key
    cap = compact_threshold if compact_threshold is not None else _COMPACT_THRESHOLD
    ck = (fp, cache_key, key_col, geometry_col, res, max_distance, cap)
    cached = _COVER_CACHE.get(ck)
    if cached is not None:
        if cached[0] == "compact":
            _, keys, ga, edge_table, res, covers = cached
            return _pip_join_compact(
                points, keys, ga, edge_table, res, covers,
                key_col, x_col, y_col, how, id_cols,
            )
        _, keys, ga, edge_table, res, cover_df, n_near, n_rb = cached
        return _pip_join_with_cover(
            points, keys, ga, edge_table, res, cover_df, n_near, n_rb,
            key_col, x_col, y_col, how, max_distance, id_cols,
        )
    keys, ga, edge_table = _decode_polygon_side(polygons, key_col, geometry_col)
    if res is None:
        bbs = geom_bounds(ga)
        # typical polygon bbox -> ~16 cells across each polygon
        spans = np.maximum(bbs[:, 2] - bbs[:, 0], bbs[:, 3] - bbs[:, 1])
        med = float(np.nanmedian(spans)) if len(spans) else 1.0
        res = pick_cover_resolution((0, 0, med, med))

    if max_distance is None:
        covers = covers_for_polygons(ga, res)
        total_full = sum(c.full_count() for _, c, _ in covers)
        if total_full > cap:
            _cover_cache_put(ck, ("compact", keys, ga, edge_table, res, covers))
            return _pip_join_compact(
                points, keys, ga, edge_table, res, covers,
                key_col, x_col, y_col, how, id_cols,
            )
        cover_df, n_near, n_rb = build_cover_df(spark, keys, ga, res, covers)
    else:
        # covers of the buffered polygons (1% oversized: the inscribed
        # buffer polygon underestimates the true distance band) — sound
        # candidate superset; every candidate refines exactly below
        from ..kernels.buffer import buffer_parts

        buf_items = []
        for g, key in enumerate(keys):
            parts = ga.geom_parts(g)
            if not parts:
                continue
            bp = buffer_parts(parts, wkb.T_POLYGON, max_distance * 1.01, quad_segs=8)
            buf_items.append((key, bp))
        bufs = [wkb.encode_geom(bp, wkb.T_POLYGON) for _, bp in buf_items]
        bga = wkb.decode(bufs)
        cover_df, n_near, n_rb = build_cover_df(spark, [k for k, _ in buf_items], bga, res)
        cover_df = cover_df.withColumn("_full", F.lit(False))

    cover_df = cover_df.cache()
    _cover_cache_put(ck, ("enum", keys, ga, edge_table, res, cover_df, n_near, n_rb))
    return _pip_join_with_cover(
        points, keys, ga, edge_table, res, cover_df, n_near, n_rb,
        key_col, x_col, y_col, how, max_distance, id_cols,
    )


def _pip_join_with_cover(
    points, keys, ga, edge_table, res, cover_df, n_near, n_rb,
    key_col, x_col, y_col, how, max_distance, id_cols=None,
):
    spark = points.sparkSession
    pts = points.withColumn("_cell", cell_of_xy_col(F.col(x_col), F.col(y_col), res))

    if max_distance is None:
        # one codegen'd pass: broadcast hash join on the cell id with the
        # unrolled PIP predicate as the join condition — FULL cells satisfy
        # it via the _full flag, PARTIAL cells via crossing parity
        pred = _pip_pred_col(F.col(x_col), F.col(y_col), n_near, n_rb)
        matched = (
            pts.join(
                F.broadcast(cover_df),
                (pts["_cell"] == cover_df["cell"]) & pred,
                "inner",
            )
            .drop("cell", "_cell", "_full", "_rbase", "_rb", "_near",
                  "_bx0", "_by0", "_bx1", "_by1")
            .withColumnRenamed("_key", key_col)
        )
    else:
        # distance refine: exact point-to-edge distance kernel (Arrow
        # batch); the test-box conjunct keeps subdivided cover rows
        # disjoint (at most one candidate row per point and polygon)
        cand = pts.join(
            F.broadcast(cover_df),
            (pts["_cell"] == cover_df["cell"])
            & _in_test_box(F.col(x_col), F.col(y_col)),
            "inner",
        ).drop("cell")
        partial = cand.drop("_full", "_rbase", "_rb", "_near",
                            "_bx0", "_by0", "_bx1", "_by1")
        bc_edges = spark.sparkContext.broadcast(edge_table)
        out_schema = partial.schema
        max_d2 = float(max_distance) * float(max_distance)

        def refine(iterator):
            edges = bc_edges.value
            for pdf in iterator:
                if len(pdf) == 0:
                    yield pdf
                    continue
                px = pdf[x_col].to_numpy(dtype=np.float64)
                py = pdf[y_col].to_numpy(dtype=np.float64)
                pkeys = pdf["_key"].to_numpy()
                mask = points_near_polygon_grouped(px, py, pkeys, edges, max_d2)
                yield pdf[mask]

        matched = (
            partial.mapInPandas(refine, schema=out_schema)
            .withColumnRenamed("_key", key_col)
            .drop("_cell")
        )

    return _apply_how(points, matched, key_col, how, id_cols)


def _apply_how(points, matched, key_col, how, id_cols=None):
    if how == "inner":
        return matched
    ids = list(id_cols) if id_cols else [c for c in points.columns]
    if how == "semi":
        return matched.drop(key_col).dropDuplicates(ids)
    if how == "anti":
        # left rows with no match: anti-join on the point side's key
        return points.join(
            matched.select(*ids).dropDuplicates(), on=ids, how="left_anti"
        )
    if how == "left":
        m = matched.select(*points.columns, key_col)
        unmatched = points.join(
            m.select(*ids).dropDuplicates(), on=ids, how="left_anti"
        ).withColumn(key_col, F.lit(None).cast("string"))
        return m.unionByName(unmatched)
    raise ValueError(f"how must be inner/left/semi/anti, got {how!r}")


def sfilter(points: DataFrame, polygons: DataFrame, **kw) -> DataFrame:
    """Spatial semi-join (reference ``sfilter.py:67-134``): keep point rows
    intersecting any polygon; no duplicates, no right columns."""
    return points_in_polygons_join(points, polygons, how="semi", **kw)


def sfilter_inverse(points: DataFrame, polygons: DataFrame, **kw) -> DataFrame:
    """Spatial anti-join (reference ``sfilter.py:209-268``)."""
    return points_in_polygons_join(points, polygons, how="anti", **kw)


def sfilter_split(points: DataFrame, polygons: DataFrame, **kw):
    """Semi + anti in one pass off a cached frame (``sfilter.py:137-206``)."""
    pts = points.cache()
    return (
        points_in_polygons_join(pts, polygons, how="semi", **kw),
        points_in_polygons_join(pts, polygons, how="anti", **kw),
    )
