"""Network operators vs driver-side graph oracle (unit-weight lattice:
least cost == Manhattan index distance; routes checked for validity +
optimality, frequencies for conservation)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ssb_sgis_spark.operators.network import (
    get_route,
    get_route_frequencies,
    make_node_ids,
    make_directed_network,
    od_cost_matrix,
)
from ssb_sgis_spark.sources.roads import NX, roads_df


@pytest.fixture(scope="module")
def lattice(spark):
    lines, nodes = make_node_ids(roads_df(spark))
    edges = make_directed_network(
        lines.withColumn("weight", F.lit(1.0)), "oneway"
    ).localCheckpoint(eager=False)
    return edges


def _ids(spark, node_ids, name):
    return spark.createDataFrame(
        [(int(n), int(n)) for n in node_ids], f"{name} long, node_id long"
    )


def test_od_cost_matrix_manhattan(spark, lattice):
    orig = _ids(spark, [0, 5 * NX + 3, 20 * NX + 20], "origin")
    dest = _ids(spark, [7, 10 * NX + 10], "destination")
    res = od_cost_matrix(lattice, orig, dest)
    got = {(r["origin"], r["destination"]): r["cost"] for r in res.collect()}
    for o in [0, 5 * NX + 3, 20 * NX + 20]:
        for d in [7, 10 * NX + 10]:
            exp = abs(o % NX - d % NX) + abs(o // NX - d // NX)
            assert got[(o, d)] == pytest.approx(float(exp))


def test_od_cutoff_and_destination_count(spark, lattice):
    orig = _ids(spark, [0], "origin")
    dest = _ids(spark, [1, 2, 3, NX, 5 * NX], "destination")
    res = od_cost_matrix(lattice, orig, dest, cutoff=2.0).collect()
    assert {r["destination"] for r in res} == {1, 2, NX}
    res2 = od_cost_matrix(lattice, orig, dest, destination_count=2).collect()
    assert len(res2) == 2
    assert {r["destination"] for r in res2} == {1, NX}  # cost-1 ties by id


def test_get_route_valid_and_optimal(spark, lattice):
    orig = _ids(spark, [0], "origin")
    dest = _ids(spark, [3 * NX + 4], "destination")
    rows = sorted(get_route(lattice, orig, dest).collect(), key=lambda r: r["seq"])
    # connected path from 0 to destination with optimal length 7
    assert rows[0]["src"] == 0
    assert rows[-1]["dst"] == 3 * NX + 4
    for a, b in zip(rows[:-1], rows[1:]):
        assert a["dst"] == b["src"]
    assert len(rows) == 7
    # every hop is a lattice edge
    for r in rows:
        d = abs(r["src"] - r["dst"])
        assert d in (1, NX)


def test_route_frequencies_conservation(spark, lattice):
    orig = _ids(spark, [0, 2], "origin")
    dest = _ids(spark, [5 * NX + 5], "destination")
    freq = get_route_frequencies(lattice, orig, dest).collect()
    # total traversals = sum of path lengths = sum of manhattan distances
    total = sum(r["frequency"] for r in freq)
    exp = (5 + 5) + (3 + 5)
    assert total == exp
