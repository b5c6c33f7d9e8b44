"""NetworkAnalysis facade — the reference's user-facing API
(``sgis/networkanalysis/networkanalysis.py:97-1174`` +
``networkanalysisrules.py:15-210``) over the engine's distributed
network operators.

A user of the reference drives everything through
``NetworkAnalysis(network, rules)`` with point-table origins and
destinations; this class reproduces that surface Spark-first:

* **weight resolution** (``networkanalysisrules.py::_validate_weight``):
  ``weight="meters"`` computes line length; otherwise the named column
  is validated (NaNs raise, like the reference).
* **origin/destination connection** (``_points.py``): each point
  connects to its candidate nodes within ``search_tolerance``, widened
  by ``search_factor`` percent+meters around the closest node
  (``networkanalysisrules.py`` docs).  Connector edges carry zero
  weight (the reference default ``nodedist_multiplier=None``), so the
  OD cost is the MIN over candidate-node pairs — expressed as an
  exploded (point, node) table + a min-aggregation instead of graph
  mutation.
* **split_lines** (``networkanalysis.py`` rules.split_lines): network
  lines are split at the exact nearest point to each origin/destination
  first (``split_lines_by_nearest_point``), so connection happens at
  the snap point rather than an existing endpoint.
* methods: :meth:`od_cost_matrix`, :meth:`get_route`,
  :meth:`get_k_routes`, :meth:`service_area`,
  :meth:`precice_service_area` — each delegates to the broadcast-graph
  / partitioned-origins operators in :mod:`.network`.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# reference ``networkanalysis.py:127``: points connect through up to 50
# candidate nodes when search_factor widens the search (k is clamped to
# the node count downstream)
CONNECT_K = 50

from .geomtable import with_length
from .knn import get_k_nearest_neighbors
from .network import (
    get_k_routes as _k_routes,
    get_route as _route,
    make_node_ids,
    od_cost_matrix as _od,
    precice_service_area as _psa,
    service_area_nodes as _sa,
)


@dataclass
class NetworkAnalysisRules:
    """Reference ``networkanalysisrules.py:15-120`` (the fields the
    engine honors; nodedist_* default to the reference's zero-weight
    connector behavior)."""

    weight: str = "meters"
    directed: bool = True
    search_tolerance: float = 250.0
    search_factor: float = 0.0
    split_lines: bool = False


class NetworkAnalysis:
    def __init__(
        self,
        lines: DataFrame,
        rules: NetworkAnalysisRules | None = None,
        geometry_col: str = "geometry",
        log: bool = True,
    ):
        self.rules = rules or NetworkAnalysisRules()
        self.geometry_col = geometry_col
        self._raw_lines = lines
        self._prepared = None
        self.log = log
        self._log_rows: list[dict] = []

    # ------------------------------------------------------------- log
    def _log_run(self, method, t0, origins, destinations, result):
        """Append one run-log row (reference ``networkanalysis.py:1259-
        1330``: endtime / minutes_elapsed / method / origins_count /
        destinations_count / percent_missing / cost_mean + the rules).

        Returns the result FRAME TO HAND BACK to the caller: logging is
        eager (the reference's geopandas semantics), so the result is
        ``localCheckpoint``-ed first and the caller's own action reuses
        those blocks instead of recomputing the whole analysis.  Returns
        ``result`` untouched when logging is off (fully lazy path).

        ``percent_missing`` follows the reference's OD definition
        (expected = |origins| x |destinations|) and is only emitted for
        od_cost_matrix — for get_route / service_area the row count is
        edges / origins-x-breaks and the ratio would be meaningless."""
        if not self.log:
            return result
        result = result.localCheckpoint()
        n_o = origins.count() if origins is not None else None
        n_d = destinations.count() if destinations is not None else None
        stats = result.agg(
            F.count(F.lit(1)).alias("_n"),
            (F.avg("cost") if "cost" in result.columns else F.lit(None)).alias(
                "_mean"
            ),
        ).first()
        expected = (n_o or 0) * (n_d or 0) if method == "od_cost_matrix" else None
        missing = (
            round(100.0 * (expected - stats["_n"]) / expected, 2)
            if expected
            else None
        )
        self._log_rows.append(
            {
                "endtime": time.strftime("%Y-%m-%d %H:%M:%S"),
                "minutes_elapsed": round((time.time() - t0) / 60.0, 3),
                "method": method,
                "origins_count": n_o,
                "destinations_count": n_d,
                "percent_missing": missing,
                "cost_mean": float(stats["_mean"]) if stats["_mean"] is not None else None,
                "weight": self.rules.weight,
                "search_tolerance": self.rules.search_tolerance,
                "search_factor": self.rules.search_factor,
                "split_lines": self.rules.split_lines,
            }
        )
        return result

    def log_df(self, spark) -> DataFrame:
        """The run log as a DataFrame (empty-safe)."""
        schema = (
            "endtime string, minutes_elapsed double, method string, "
            "origins_count long, destinations_count long, "
            "percent_missing double, cost_mean double, weight string, "
            "search_tolerance double, search_factor double, split_lines boolean"
        )
        return spark.createDataFrame(self._log_rows, schema)

    # ------------------------------------------------------------ prep
    def _edges(self, extra_points: DataFrame | None = None):
        """(edges_with_weight, nodes); rebuilt when split_lines needs the
        per-call origin/destination points."""
        lines = self._raw_lines
        if self.rules.split_lines and extra_points is not None:
            from .lineops import split_lines_by_nearest_point

            lines = lines.withColumn("_slid", F.monotonically_increasing_id())
            lines = split_lines_by_nearest_point(
                lines, extra_points, max_distance=self.rules.search_tolerance,
                line_id="_slid", geometry_col=self.geometry_col,
            ).drop("_slid")
        elif self._prepared is not None:
            return self._prepared

        lines2, nodes = make_node_ids(lines, self.geometry_col)
        if self.rules.weight in ("meters", "metres"):
            lines2 = with_length(lines2, self.geometry_col, "_w")
        else:
            if self.rules.weight not in lines2.columns:
                raise ValueError(
                    f"weight column {self.rules.weight!r} not in network"
                )
            n_bad = lines2.filter(F.col(self.rules.weight).isNull()).count()
            if n_bad:
                raise ValueError(
                    f"NaN values in the {self.rules.weight!r} column. Either "
                    "remove NaNs or fill with actual values."
                )
            lines2 = lines2.withColumn("_w", F.col(self.rules.weight))
        if not self.rules.directed:
            rev = lines2.withColumn("_tmp", F.col("source")).withColumn(
                "source", F.col("target")
            ).withColumn("target", F.col("_tmp")).drop("_tmp")
            lines2 = lines2.unionByName(rev)
        prepared = (lines2.localCheckpoint(eager=False), nodes)
        if not (self.rules.split_lines and extra_points is not None):
            self._prepared = prepared
        return prepared

    def _connect(self, points: DataFrame, nodes: DataFrame, id_col: str):
        """(id, node_id) candidate pairs within search_tolerance, widened
        by search_factor around each point's closest node."""
        # reference parity: up to 50 candidate nodes per point when the
        # search widens (get_k_nearest_neighbors clamps k to n_nodes)
        k = CONNECT_K if self.rules.search_factor > 0 else 1
        nn = get_k_nearest_neighbors(
            points, nodes.withColumnRenamed("x", "px").withColumnRenamed("y", "py"),
            k=k, left_id=id_col, right_id="node_id",
        )
        if self.rules.search_factor > 0:
            w = Window.partitionBy(id_col)
            nn = nn.withColumn("_closest", F.min("distance").over(w)).filter(
                F.col("distance")
                <= F.col("_closest") * (1 + self.rules.search_factor / 100.0)
                + self.rules.search_factor
            )
        return (
            nn.filter(F.col("distance") <= self.rules.search_tolerance)
            .select(F.col(id_col), F.col("neighbor_id").alias("node_id"))
        )

    # --------------------------------------------------------- queries
    def od_cost_matrix(
        self,
        origins: DataFrame,
        destinations: DataFrame,
        *,
        cutoff: float | None = None,
        destination_count: int | None = None,
    ) -> DataFrame:
        """(origin, destination, cost) — min over zero-weight connector
        pairs (reference ``od_cost_matrix``, ``networkanalysis.py:145-418``)."""
        t0 = time.time()
        pts = origins.select(F.col("x"), F.col("y")).unionByName(
            destinations.select("x", "y")
        )
        edges, nodes = self._edges(pts if self.rules.split_lines else None)
        o = self._connect(origins, nodes, "origin")
        d = self._connect(destinations, nodes, "destination")
        res = _od(
            edges.select("source", "target", "_w"),
            o, d.withColumnRenamed("destination", "destination"),
            weight_col="_w", origin_id="origin", dest_id="destination",
        )
        out = res.groupBy("origin", "destination").agg(F.min("cost").alias("cost"))
        if cutoff is not None:
            out = out.filter(F.col("cost") <= cutoff)
        if destination_count is not None:
            w = Window.partitionBy("origin").orderBy("cost", "destination")
            out = (
                out.withColumn("_r", F.row_number().over(w))
                .filter(F.col("_r") <= destination_count)
                .drop("_r")
            )
        return self._log_run("od_cost_matrix", t0, origins, destinations, out)

    def _best_nodes(self, points: DataFrame, nodes: DataFrame, id_col: str):
        """One (deterministic, nearest) node per point for path queries."""
        nn = get_k_nearest_neighbors(
            points, nodes.withColumnRenamed("x", "px").withColumnRenamed("y", "py"),
            k=1, left_id=id_col, right_id="node_id",
        )
        return (
            nn.filter(F.col("distance") <= self.rules.search_tolerance)
            .select(F.col(id_col), F.col("neighbor_id").alias("node_id"))
        )

    def get_route(self, origins: DataFrame, destinations: DataFrame) -> DataFrame:
        t0 = time.time()
        pts = origins.select("x", "y").unionByName(destinations.select("x", "y"))
        edges, nodes = self._edges(pts if self.rules.split_lines else None)
        o = self._best_nodes(origins, nodes, "origin")
        d = self._best_nodes(destinations, nodes, "destination")
        out = _route(
            edges.select("source", "target", "_w"), o, d,
            weight_col="_w", origin_id="origin", dest_id="destination",
        )
        return self._log_run("get_route", t0, origins, destinations, out)

    def get_k_routes(
        self,
        origins: DataFrame,
        destinations: DataFrame,
        *,
        k: int,
        drop_middle_percent: float,
    ) -> DataFrame:
        t0 = time.time()
        pts = origins.select("x", "y").unionByName(destinations.select("x", "y"))
        edges, nodes = self._edges(pts if self.rules.split_lines else None)
        o = self._best_nodes(origins, nodes, "origin")
        d = self._best_nodes(destinations, nodes, "destination")
        out = _k_routes(
            edges.select("source", "target", "_w"), o, d,
            k=k, drop_middle_percent=drop_middle_percent,
            weight_col="_w", origin_id="origin", dest_id="destination",
        )
        return self._log_run("get_k_routes", t0, origins, destinations, out)

    def service_area(self, origins: DataFrame, breaks: list[float]) -> DataFrame:
        t0 = time.time()
        edges, nodes = self._edges(
            origins.select("x", "y") if self.rules.split_lines else None
        )
        o = self._best_nodes(origins, nodes, "origin")
        out = _sa(
            edges.select("source", "target", "_w"), o, breaks,
            weight_col="_w", origin_id="origin",
        )
        return self._log_run("service_area", t0, origins, None, out)

    def precice_service_area(
        self, origins: DataFrame, breaks: list[float]
    ) -> DataFrame:
        t0 = time.time()
        edges, nodes = self._edges(
            origins.select("x", "y") if self.rules.split_lines else None
        )
        o = self._best_nodes(origins, nodes, "origin")
        out = _psa(
            edges.select("source", "target", "_w", self.geometry_col), o, breaks,
            weight_col="_w", origin_id="origin", geometry_col=self.geometry_col,
        )
        return self._log_run("precice_service_area", t0, origins, None, out)
