"""Polygon clusters + distributed connected components.

Reference: ``get_polygon_clusters`` (``sgis/geopandas_tools/
polygon_operations.py:31-188``): STRtree self-join pairs → networkx
``connected_components`` → cluster label column.  At 10^12 rows neither a
driver-side graph nor a global STRtree exists, so:

* candidate pair edges come from the bbox-cell cover self-join
  (:func:`polygon_pair_edges`) refined by the exact
  :func:`~ssb_sgis_spark.kernels.boolean.parts_intersect` predicate in an
  Arrow batch, and
* components are computed by **iterative hash-min label propagation with
  pointer jumping** (label-of-label join each round → O(log diameter)
  rounds), each iteration ``localCheckpoint``-ed to cut lineage — the
  DataFrame equivalent of map-reduce CC (large-star/small-star family).

``cluster_points_within_distance`` is the point specialization used by
buffdissexp-by-cluster pipelines on page points: buffering points by r and
clustering overlaps ≡ clustering points with pairwise distance < 2r, so
the pair edges are a native 3×3 neighbor-cell join + distance filter —
no geometry ever materializes for the 10^12-point side.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..cells import cell_index_col, cell_size, morton_from_ixy_col, DOMAIN_SIZE, MAX_RES
from ..kernels import wkb
from ..kernels.boolean import parts_intersect
from .geomtable import (
    bbox_cells_exploded,
    bbox_overlap_filter,
    pick_pair_resolution,
    reference_cell_filter,
    with_bounds,
)


# -------------------------------------------------------- pair generation
def polygon_pair_edges(
    df: DataFrame,
    id_col: str,
    geometry_col: str = "geometry",
    res: int | None = None,
) -> DataFrame:
    """(src, dst) edges between intersecting polygons of one table —
    self-join candidate pairs + exact predicate refine (the reference's
    STRtree self-query, ``polygon_operations.py:100-110``)."""
    b = with_bounds(df.select(id_col, geometry_col), geometry_col)
    if res is None:
        res = pick_pair_resolution(b)
    left = bbox_cells_exploded(b, res)
    right = b.select(
        F.col(id_col).alias("_dst"),
        F.col(geometry_col).alias("_geom2"),
        *[F.col(c).alias(c + "_2") for c in ("minx", "miny", "maxx", "maxy")],
    )
    right = bbox_cells_exploded(
        right, res, minx="minx_2", miny="miny_2", maxx="maxx_2", maxy="maxy_2"
    )
    pairs = (
        left.join(right, "cell")
        .filter(F.col(id_col) < F.col("_dst"))
        .filter(bbox_overlap_filter())
        .filter(reference_cell_filter(res))
    )

    out_schema = T.StructType(
        [
            T.StructField("src", df.schema[id_col].dataType),
            T.StructField("dst", df.schema[id_col].dataType),
        ]
    )

    def refine(it):
        from .overlay import _detect_boxes

        for pdf in it:
            if not len(pdf):
                continue
            ga = wkb.decode(pdf[geometry_col].tolist())
            gb = wkb.decode(pdf["_geom2"].tolist())
            # box x box pairs that survived the bbox-overlap filter are
            # intersecting by definition — skip the per-pair kernel for
            # the dominant tile/grid shape (same fast path as overlay)
            am, *_ = _detect_boxes(ga)
            bm, *_ = _detect_boxes(gb)
            both = am & bm
            keep = list(np.flatnonzero(both)) + [
                i
                for i in np.flatnonzero(~both)
                if parts_intersect(ga.geom_parts(i), gb.geom_parts(i))
            ]
            o = pdf.iloc[sorted(keep)][[id_col, "_dst"]].copy()
            o.columns = ["src", "dst"]
            yield o

    return pairs.mapInPandas(refine, schema=out_schema)


def point_pair_edges_within(
    df: DataFrame,
    distance: float,
    id_col: str = "uid",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """(src, dst) edges between points closer than ``distance`` — native
    3×3 neighbor-cell equi-join + distance filter, no Python, no WKB.
    Each pair appears exactly once (left emits 1 cell, right emits its
    3×3 block), so no dedup shuffle is needed."""
    res = int(np.clip(int(np.floor(np.log2(DOMAIN_SIZE / distance))), 2, MAX_RES))
    # join on raw (ix, iy) integer cell indices, NOT the Morton code: the
    # interleave expression tree grows ~3^5× per bit-spread and 9 neighbor
    # copies of it blow up whole-stage codegen (janino OOM).  Two int
    # columns shuffle identically.
    ix = cell_index_col(F.col(x_col), res, "x")
    iy = cell_index_col(F.col(y_col), res, "y")
    left = df.select(
        F.col(id_col).alias("src"),
        F.col(x_col).alias("_x1"),
        F.col(y_col).alias("_y1"),
        ix.alias("_jx"),
        iy.alias("_jy"),
    )
    neigh = [
        F.struct((ix + dx).alias("_jx"), (iy + dy).alias("_jy"))
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
    ]
    right = (
        df.select(
            F.col(id_col).alias("dst"),
            F.col(x_col).alias("_x2"),
            F.col(y_col).alias("_y2"),
            F.explode(F.array(*neigh)).alias("_n"),
        )
        .select("dst", "_x2", "_y2", "_n._jx", "_n._jy")
    )
    d2 = F.lit(float(distance) * float(distance))
    dx = F.col("_x1") - F.col("_x2")
    dy = F.col("_y1") - F.col("_y2")
    return (
        left.join(right, ["_jx", "_jy"])
        .filter(F.col("src") < F.col("dst"))
        .filter(dx * dx + dy * dy < d2)
        .select("src", "dst")
    )


# ---------------------------------------------------- connected components
def connected_components(
    edges: DataFrame,
    vertices: DataFrame,
    id_col: str = "id",
    component_col: str = "component",
    max_iter: int = 50,
) -> DataFrame:
    """Label every vertex with min-id of its connected component.

    Hash-min propagation + pointer jumping, localCheckpoint per round:
    round = (label ← min(label, neighbors' labels)) ∘ (label ← label of
    label).  Converges in O(log diameter) rounds; each round is two
    shuffles on (id) — scale-safe, no driver-side graph (unlike the
    reference's networkx path, ``polygon_operations.py:147-155``).

    The iterative rounds run ONLY over edge-touched vertices; vertices
    with no incident edge are self-labeled singletons unioned back
    map-only at the end.  Output-identical, but per-round shuffle cost
    is proportional to the component graph, not the vertex set — on a
    near-duplicate graph over a web corpus the dup graph is orders of
    magnitude smaller than the corpus, so this is the difference
    between shuffling a trillion labels per round and shuffling the
    few that are actually in play.
    """
    sym = edges.selectExpr("src as a", "dst as b").unionAll(
        edges.selectExpr("dst as a", "src as b")
    )
    sym = sym.localCheckpoint(eager=True)
    verts = vertices.select(F.col(id_col).alias("v"))
    # edge-touched vertices only (∩ vertices, preserving the contract
    # that output rows ⊆ the vertices frame even if edges mention ids
    # outside it)
    active = verts.join(
        sym.select(F.col("a").alias("v")).distinct(), "v", "left_semi"
    )
    labels = active.select(F.col("v"), F.col("v").alias("lbl"))
    labels = labels.localCheckpoint(eager=True)
    singletons = verts.join(labels.select("v"), "v", "left_anti").select(
        F.col("v"), F.col("v").alias("lbl")
    )

    def step(lbls):
        # neighbor min
        nbr_min = (
            sym.join(lbls, sym["b"] == lbls["v"])
            .groupBy("a")
            .agg(F.min("lbl").alias("nlbl"))
        )
        new = (
            lbls.join(nbr_min, lbls["v"] == nbr_min["a"], "left")
            .select(
                F.col("v"),
                F.least(F.col("lbl"), F.coalesce(F.col("nlbl"), F.col("lbl"))).alias(
                    "lbl"
                ),
            )
        )
        # pointer jumping: lbl <- lbl(lbl)
        l2 = new.selectExpr("v as v2", "lbl as lbl2")
        return (
            new.join(l2, new["lbl"] == l2["v2"], "left")
            .select(F.col("v"), F.coalesce(F.col("lbl2"), F.col("lbl")).alias("lbl"))
        )

    prev_fp = None
    for _ in range(max_iter):
        # TWO propagation steps per checkpoint/fingerprint: the per-round
        # fixed costs (eager checkpoint + driver agg = 2 actions) dominate
        # the per-step shuffles until the graph is huge, and a step past
        # convergence is a no-op, so halving the rounds is semantics-free
        jumped = step(step(labels)).localCheckpoint(eager=True)
        # convergence fingerprint: sum of label hashes — type-agnostic
        # (works for string ids too; a decimal cast would NULL them and
        # stop after one round) and carried across rounds so each round
        # pays ONE driver aggregation, not two
        new_fp = jumped.agg(F.sum(F.xxhash64("lbl").cast("decimal(38,0)"))).collect()[0][0]
        labels = jumped
        if new_fp == prev_fp:
            break
        prev_fp = new_fp
    return labels.unionByName(singletons).select(
        F.col("v").alias(id_col), F.col("lbl").alias(component_col)
    )


def get_polygon_clusters(
    df: DataFrame,
    cluster_col: str = "cluster",
    geometry_col: str = "geometry",
    id_col: str | None = None,
    res: int | None = None,
) -> DataFrame:
    """Append a cluster label (min member id) to every row — reference
    ``get_polygon_clusters`` (``polygon_operations.py:31-188``), with
    integer min-id labels instead of positional ones."""
    drop_id = False
    if id_col is None:
        df = df.withColumn("_cid", F.monotonically_increasing_id())
        df = df.localCheckpoint(eager=True)  # pin nondeterministic ids
        id_col = "_cid"
        drop_id = True
    edges = polygon_pair_edges(df, id_col, geometry_col, res)
    comp = connected_components(
        edges, df.select(id_col), id_col=id_col, component_col=cluster_col
    )
    out = df.join(comp, id_col, "left").withColumn(
        cluster_col, F.coalesce(F.col(cluster_col), F.col(id_col))
    )
    return out.drop("_cid") if drop_id else out


def cluster_points_within_distance(
    df: DataFrame,
    distance: float,
    id_col: str = "uid",
    x_col: str = "x",
    y_col: str = "y",
    cluster_col: str = "cluster",
) -> DataFrame:
    """Cluster points whose pairwise distance < ``distance`` (≡ clustering
    r=distance/2 point buffers by overlap).  Returns df + cluster label."""
    edges = point_pair_edges_within(df, distance, id_col, x_col, y_col)
    comp = connected_components(
        edges, df.select(id_col), id_col=id_col, component_col=cluster_col
    )
    return df.join(comp, id_col, "left").withColumn(
        cluster_col, F.coalesce(F.col(cluster_col), F.col(id_col))
    )
