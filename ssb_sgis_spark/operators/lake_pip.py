"""Cell-partitioned lake + partition-PRUNED point-in-polygon join.

North-star parity (BASELINE.json): pages are "indexed into H3/S2 cells
for partition-pruned point-in-polygon joins against Norwegian
municipality/grid polygons".  The existing `tiled_pip` path prunes with
*bbox predicates* (parquet row-group / min-max pruning); this module is
the *partition-level* variant — the lake is physically laid out
PARTITIONED BY a coarse Morton cell, and a PIP join against a polygon
frame reads ONLY the partitions whose cell intersects some polygon's
cover (`PartitionFilters` in the scan, directories never opened).

Why this matters at 10^12 rows: row-group pruning still lists and opens
every file's footer; partition pruning skips whole directories at the
catalog/listing level, which is the only listing strategy that survives
a million-file lake.  A regional query (one county's municipalities)
touches a constant number of partitions regardless of lake size.

Scale notes:
* ``res_part`` trades pruning granularity against file count — at the
  default each partition is a ~16 km cell, so a national lake lands in
  O(10^3) partitions and a municipality query reads O(10) of them.
* The hot-spot skew (40 % of pages in one 16 km cluster) concentrates
  in O(1) partitions; downstream join work is still balanced because the
  PIP join repartitions by input split, not by partition directory, and
  Spark splits large files into multiple tasks.
* Writing the lake is a one-time cost amortized over every later query
  (the lake-table model); :func:`ensure_cell_lake` keys the layout by
  the page frame's logical-plan fingerprint so repeated calls reuse it.

Reference: sjoin candidate generation (sgis ``sfilter.py:51-59``); the
partition-pruned read has no reference counterpart (GeoPandas is
single-node) — it is the Spark-first re-expression of the same
cover-candidate idea at the storage layer.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cells import cell_of_xy_col, covers_for_polygons
from ..sources.io import read_lake_table, write_lake_table
from .sjoin import _decode_polygon_side, points_in_polygons_join

# ~16 km partition cells (DOMAIN_SIZE / 2^9): national lake -> O(10^3)
# directories, single-municipality query -> O(10) of them.
DEFAULT_PARTITION_RES = 9

_CELL_COL = "cell"

# monotone suffix for lakes written without any obtainable fingerprint
_NO_FP_SEQ = 0

# partition-cell lists keyed by polygon-frame fingerprint (FIFO-bounded)
_PART_CELL_CACHE: dict = {}


def write_cell_partitioned_lake(
    pages: DataFrame,
    path: str,
    res_part: int = DEFAULT_PARTITION_RES,
    *,
    x_col: str = "x",
    y_col: str = "y",
    mode: str = "overwrite",
) -> None:
    """Write ``pages`` partitioned by its coarse Morton cell.

    The cell id is a native column expression (whole-stage codegen; the
    10^12-row side never touches Python) and becomes the physical
    partition key — Iceberg identity-partition when the runtime is on
    the classpath, parquet ``partitionBy`` directories otherwise.
    """
    df = pages.withColumn(
        _CELL_COL, cell_of_xy_col(F.col(x_col), F.col(y_col), res_part)
    )
    write_lake_table(df, path, mode=mode, partition_by=[_CELL_COL])


def partition_cells_for_polygons(
    polygons: DataFrame,
    res_part: int = DEFAULT_PARTITION_RES,
    *,
    key_col: str = "muni_id",
    geometry_col: str = "geometry",
) -> list[int]:
    """Union of the polygons' cover cells at the partition resolution.

    FULL ∪ PARTIAL covers every cell containing any point of any
    polygon, so filtering the lake to these cells is a SUPERSET of the
    PIP join's matching pages — pruning never changes the result.
    Driver-side work: the polygon side is the broadcast-small dimension
    (same collect the cover join already does); repeated calls against
    the same polygon frame reuse the cell list via the plan-fingerprint
    cache (the inner join caches its own finer-res cover the same way,
    so a repeated pruned query does zero driver decode work).
    """
    try:
        fp = polygons.semanticHash()
    except Exception:
        fp = None
    ck = (fp, res_part, key_col, geometry_col)
    if fp is not None and ck in _PART_CELL_CACHE:
        return _PART_CELL_CACHE[ck]
    _, ga, _ = _decode_polygon_side(polygons, key_col, geometry_col)
    cells: set[int] = set()
    for _, cover, _ in covers_for_polygons(ga, res_part):
        cells.update(int(c) for c in cover.full)
        cells.update(int(c) for c in cover.partial)
    out = sorted(cells)
    if fp is not None:
        if len(_PART_CELL_CACHE) >= 16:
            _PART_CELL_CACHE.pop(next(iter(_PART_CELL_CACHE)))
        _PART_CELL_CACHE[ck] = out
    return out


def pip_join_lake_pruned(
    spark: SparkSession,
    lake_path: str,
    polygons: DataFrame,
    res_part: int = DEFAULT_PARTITION_RES,
    **pip_kwargs,
) -> DataFrame:
    """PIP join reading ONLY lake partitions under some polygon's cover.

    Plan shape: scan with ``PartitionFilters: [cell IN (...)]`` (pruned
    at listing time) → the standard broadcast cover join with the
    codegen ray-cast predicate.  Result rows are identical to
    :func:`points_in_polygons_join` over the full lake.
    """
    cells = partition_cells_for_polygons(
        polygons,
        res_part,
        key_col=pip_kwargs.get("key_col", "muni_id"),
        geometry_col=pip_kwargs.get("geometry_col", "geometry"),
    )
    pages = (
        read_lake_table(spark, lake_path)
        .filter(F.col(_CELL_COL).isin(cells))
        .drop(_CELL_COL)
    )
    return points_in_polygons_join(pages, polygons, **pip_kwargs)


def ensure_cell_lake(
    pages: DataFrame,
    res_part: int = DEFAULT_PARTITION_RES,
    base: str = "/tmp/ssb_sgis_lake",
) -> str:
    """Idempotently materialize the cell-partitioned lake for ``pages``.

    Keyed by the frame's logical-plan fingerprint (``semanticHash``,
    falling back to a hash of the analyzed-plan text) so the one-time
    write is amortized across queries/sessions — the lake model.  When
    NO fingerprint is obtainable the lake is written fresh under a
    process-unique suffix: reusing a constant key there would silently
    serve one frame's lake to a query over a different frame (wrong rows,
    no error), and correctness beats reuse.  Returns the lake path.
    """
    fp: int | None
    try:
        fp = pages.semanticHash() & 0xFFFFFFFF
    except Exception:
        try:
            import zlib

            plan = pages._jdf.queryExecution().analyzed().toString()  # noqa: SLF001
            fp = zlib.crc32(plan.encode())
        except Exception:
            fp = None
    if fp is None:
        global _NO_FP_SEQ
        _NO_FP_SEQ += 1
        suffix = f"nofp_{os.getpid()}_{_NO_FP_SEQ}"
        path = os.path.join(base, f"cells_r{res_part}_{suffix}")
    else:
        path = os.path.join(base, f"cells_r{res_part}_{fp:08x}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        write_cell_partitioned_lake(pages, path, res_part)
    return path
