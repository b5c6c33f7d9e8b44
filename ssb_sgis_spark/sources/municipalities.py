"""Deterministic synthetic municipality polygons (the broadcast side).

Models the KOMMUNENR polygon tables consumed by the reference's
``write_municipality_data`` (``io/write_municipality_data.py:14-24``):
a valid, non-overlapping, gap-free tessellation of the page extent into
``nx * ny`` quadrilaterals built from a deterministically perturbed grid
(shared corners => watertight).  A deterministic subset of polygons gets a
square interior hole, exercising the hole branch of ray-casting PIP; hole
areas belong to *no* municipality.

Everything is reproducible from (nx, ny, seed) — the same polygons are
materialised as:
  * a numpy edge table / GeomArray (engine + pytest oracle),
  * a Spark DataFrame of WKB polygons (the engine's broadcast input),
  * an inline SQL ``VALUES`` edge relation (the DuckDB PIP oracle —
    crossing-parity point-in-polygon is plain SQL over the edge table).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from ..kernels import wkb

# municipality extent: inset 4 km into the page extent so a deterministic
# slice of pages falls outside every polygon (anti-join test surface).
MUNI_X0, MUNI_Y0 = 204000.0, 6564000.0
MUNI_X1, MUNI_Y1 = 356000.0, 6716000.0
DEFAULT_NX = 6
DEFAULT_NY = 6
SEED = 42
HOLE_EVERY = 7  # polygon index % 7 == 3 gets a hole
HOLE_FRAC = 0.25  # hole side as fraction of cell pitch


def _grid_corners(nx: int, ny: int, seed: int = SEED) -> tuple[np.ndarray, np.ndarray]:
    """Perturbed (nx+1, ny+1) grid corner coordinates; border corners stay
    on the extent boundary so the tessellation exactly tiles it."""
    rng = np.random.RandomState(seed)
    xs = np.linspace(MUNI_X0, MUNI_X1, nx + 1)
    ys = np.linspace(MUNI_Y0, MUNI_Y1, ny + 1)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    pitch_x = (MUNI_X1 - MUNI_X0) / nx
    pitch_y = (MUNI_Y1 - MUNI_Y0) / ny
    jx = (rng.rand(nx + 1, ny + 1) - 0.5) * 0.55 * pitch_x
    jy = (rng.rand(nx + 1, ny + 1) - 0.5) * 0.55 * pitch_y
    jx[0, :] = jx[-1, :] = 0.0
    jy[:, 0] = jy[:, -1] = 0.0
    return gx + jx, gy + jy


def muni_rings(nx: int = DEFAULT_NX, ny: int = DEFAULT_NY, seed: int = SEED):
    """Return list of (muni_id, [exterior_ring, *hole_rings]) — rings are
    closed (first == last) float64 (k, 2) arrays, exterior CCW, holes CW."""
    gx, gy = _grid_corners(nx, ny, seed)
    pitch_x = (MUNI_X1 - MUNI_X0) / nx
    pitch_y = (MUNI_Y1 - MUNI_Y0) / ny
    out = []
    k = 0
    for i in range(nx):
        for j in range(ny):
            # CCW: SW, SE, NE, NW
            ring = np.array(
                [
                    (gx[i, j], gy[i, j]),
                    (gx[i + 1, j], gy[i + 1, j]),
                    (gx[i + 1, j + 1], gy[i + 1, j + 1]),
                    (gx[i, j + 1], gy[i, j + 1]),
                    (gx[i, j], gy[i, j]),
                ],
                dtype=np.float64,
            )
            rings = [ring]
            if k % HOLE_EVERY == 3:
                cx = ring[:-1, 0].mean()
                cy = ring[:-1, 1].mean()
                hx = HOLE_FRAC * pitch_x / 2.0
                hy = HOLE_FRAC * pitch_y / 2.0
                # CW hole
                hole = np.array(
                    [
                        (cx - hx, cy - hy),
                        (cx - hx, cy + hy),
                        (cx + hx, cy + hy),
                        (cx + hx, cy - hy),
                        (cx - hx, cy - hy),
                    ],
                    dtype=np.float64,
                )
                rings.append(hole)
            muni_id = f"{k + 101:04d}"
            out.append((muni_id, rings))
            k += 1
    return out


def muni_geom_array(nx: int = DEFAULT_NX, ny: int = DEFAULT_NY, seed: int = SEED):
    """(ids, GeomArray) for the municipality batch."""
    items = muni_rings(nx, ny, seed)
    ids = [m for m, _ in items]
    bufs = [wkb.encode_polygon(rings) for _, rings in items]
    return ids, wkb.decode(bufs)


_MUNI_DF_CACHE: dict = {}


def muni_df(
    spark: SparkSession, nx: int = DEFAULT_NX, ny: int = DEFAULT_NY, seed: int = SEED
) -> DataFrame:
    """Spark DataFrame (muni_id string, name string, geometry binary WKB).

    Memoized per (session, params): the frame is a deterministic local
    relation, and re-running createDataFrame + analysis for every query
    that joins against municipalities costs ~1 s each at bench scale."""
    key = (spark.sparkContext.applicationId, nx, ny, seed)
    got = _MUNI_DF_CACHE.get(key)
    if got is not None:
        return got
    items = muni_rings(nx, ny, seed)
    rows = [
        (mid, f"muni_{mid}", bytearray(wkb.encode_polygon(rings))) for mid, rings in items
    ]
    df = spark.createDataFrame(
        rows, "muni_id string, name string, geometry binary"
    ).localCheckpoint()
    if len(_MUNI_DF_CACHE) > 8:
        old = _MUNI_DF_CACHE.pop(next(iter(_MUNI_DF_CACHE)))
        try:  # release the evicted frame's checkpoint blocks
            old.unpersist()
        except Exception:
            pass
    _MUNI_DF_CACHE[key] = df
    return df


def muni_edges_sql_values(nx: int = DEFAULT_NX, ny: int = DEFAULT_NY, seed: int = SEED) -> str:
    """Inline SQL VALUES relation ``(muni_id, x1, y1, x2, y2)`` with one row
    per directed ring edge (holes included — crossing parity handles them).
    ``repr(float)`` round-trips, so DuckDB parses back the identical
    doubles the engine uses."""
    rows = []
    for mid, rings in muni_rings(nx, ny, seed):
        for ring in rings:
            for a, b in zip(ring[:-1], ring[1:]):
                rows.append(
                    f"('{mid}',{a[0]!r},{a[1]!r},{b[0]!r},{b[1]!r})"
                )
    return ",\n".join(rows)


def muni_edge_table(nx: int = DEFAULT_NX, ny: int = DEFAULT_NY, seed: int = SEED) -> dict:
    """{muni_id: (x1, y1, x2, y2)} numpy edge arrays — the PIP refine input."""
    out = {}
    for mid, rings in muni_rings(nx, ny, seed):
        x1 = np.concatenate([r[:-1, 0] for r in rings])
        y1 = np.concatenate([r[:-1, 1] for r in rings])
        x2 = np.concatenate([r[1:, 0] for r in rings])
        y2 = np.concatenate([r[1:, 1] for r in rings])
        out[mid] = (x1, y1, x2, y2)
    return out
