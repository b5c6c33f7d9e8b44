"""File-backed raster IO — minimal pure-numpy GeoTIFF reader/writer and
a Spark block-range loader.

Reference surface: ``Raster.from_path`` (``raster/raster.py:255``),
``Raster.load`` (``:417``), ``Raster.clip`` (``:436``),
``Raster.sample`` (``:460``) — the reference delegates all of this to
rasterio/GDAL, which is not in this sandbox, so the engine carries its
own decoder for the COG-ish subset that actually appears in data lakes:

* classic TIFF, little- or big-endian (BigTIFF raises with a clear
  message — cloud lakes store rasters as <=4 GB COG objects anyway);
* single-band, tiled OR stripped layout;
* uncompressed or DEFLATE (zlib, compression ids 8 and 32946), with
  horizontal-differencing predictor 1 or 2;
* uint8/16/32, int8/16/32, float32/64 samples;
* georeferencing from ModelPixelScale + ModelTiepoint, nodata from the
  GDAL_NODATA ASCII tag.

Scale model: the driver parses only the IFD (a few KB); the block
(tile/strip) descriptor table becomes a DataFrame and each EXECUTOR
range-reads and decodes its own blocks inside ``mapInPandas`` — the
same access pattern an S3/HDFS ranged GET gives a 1000-executor
cluster, so a raster mosaic loads with no driver bottleneck.  ``clip``
filters the descriptor table BEFORE any payload is read (partition
pruning for rasters).
"""

from __future__ import annotations

import os
import struct
import zlib
from dataclasses import dataclass

import numpy as np

# (BitsPerSample, SampleFormat) -> numpy dtype char (endian applied later)
_DTYPES = {
    (8, 1): "u1",
    (16, 1): "u2",
    (32, 1): "u4",
    (8, 2): "i1",
    (16, 2): "i2",
    (32, 2): "i4",
    (32, 3): "f4",
    (64, 3): "f8",
}
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f", 12: "d"}


@dataclass
class GeoTiffMeta:
    path: str
    width: int
    height: int
    dtype: str          # numpy dtype string WITH byte order, e.g. "<i4"
    compression: int    # 1 = none, 8/32946 = deflate
    predictor: int      # 1 = none, 2 = horizontal differencing
    tile_w: int         # block width (== width for stripped files)
    tile_h: int         # block height (RowsPerStrip for stripped files)
    tiled: bool
    offsets: list[int]
    bytecounts: list[int]
    x0: float           # west edge (origin of cell (0, _))
    y1: float           # NORTH edge (TIFF row 0 is the top row)
    cell: float
    nodata: float | None

    @property
    def ntx(self) -> int:
        return (self.width + self.tile_w - 1) // self.tile_w

    @property
    def nty(self) -> int:
        return (self.height + self.tile_h - 1) // self.tile_h

    @property
    def y0(self) -> float:
        """South edge — the engine's tile frames are south-origin."""
        return self.y1 - self.height * self.cell

    @property
    def bounds(self) -> tuple[float, float, float, float]:
        return (self.x0, self.y0, self.x0 + self.width * self.cell, self.y1)


def read_meta(path: str) -> GeoTiffMeta:
    """Parse the TIFF header + first IFD (driver-side, a few KB of IO)."""
    with open(path, "rb") as f:
        head = f.read(8)
        if head[:2] == b"II":
            bo = "<"
        elif head[:2] == b"MM":
            bo = ">"
        else:
            raise ValueError(f"{path}: not a TIFF (bad byte-order mark)")
        magic = struct.unpack(bo + "H", head[2:4])[0]
        if magic == 43:
            raise ValueError(
                f"{path}: BigTIFF not supported — re-chunk the mosaic into "
                "<=4 GB classic-TIFF/COG objects (the cloud-lake layout)"
            )
        if magic != 42:
            raise ValueError(f"{path}: bad TIFF magic {magic}")
        ifd_off = struct.unpack(bo + "I", head[4:8])[0]
        f.seek(ifd_off)
        n = struct.unpack(bo + "H", f.read(2))[0]
        raw_entries = [f.read(12) for _ in range(n)]

        tags: dict[int, list] = {}
        for e in raw_entries:
            tag, typ, cnt = struct.unpack(bo + "HHI", e[:8])
            size = _TYPE_SIZE.get(typ, 1) * cnt
            if size <= 4:
                payload = e[8 : 8 + size]
            else:
                off = struct.unpack(bo + "I", e[8:12])[0]
                f.seek(off)
                payload = f.read(size)
            if typ == 2:  # ASCII
                tags[tag] = [payload.rstrip(b"\x00").decode("ascii", "replace")]
            elif typ == 5:  # RATIONAL
                vals = struct.unpack(bo + "%dI" % (2 * cnt), payload)
                tags[tag] = [vals[i] / max(vals[i + 1], 1) for i in range(0, 2 * cnt, 2)]
            elif typ in _TYPE_FMT:
                tags[tag] = list(struct.unpack(bo + "%d%s" % (cnt, _TYPE_FMT[typ]), payload))
            else:
                tags[tag] = []

    def one(tag, default=None):
        v = tags.get(tag)
        return v[0] if v else default

    width, height = int(one(256)), int(one(257))
    bits = int(one(258, 8))
    comp = int(one(259, 1))
    spp = int(one(277, 1))
    fmt = int(one(339, 1))
    pred = int(one(317, 1))
    if spp != 1:
        raise ValueError(f"{path}: only single-band rasters supported (SamplesPerPixel={spp})")
    if comp not in (1, 8, 32946):
        raise ValueError(f"{path}: unsupported compression id {comp} (need none/deflate)")
    key = (bits, fmt)
    if key not in _DTYPES:
        raise ValueError(f"{path}: unsupported sample type bits={bits} format={fmt}")
    dtype = bo + _DTYPES[key]

    if 322 in tags:  # tiled
        tile_w, tile_h = int(one(322)), int(one(323))
        offsets = [int(v) for v in tags[324]]
        bytecounts = [int(v) for v in tags[325]]
        tiled = True
    else:  # stripped: strips are full-width blocks
        tile_w = width
        tile_h = int(one(278, height))
        offsets = [int(v) for v in tags[273]]
        bytecounts = [int(v) for v in tags[279]]
        tiled = False

    scale = tags.get(33550, [1.0, 1.0])
    tie = tags.get(33922, [0.0, 0.0, 0.0, 0.0, 0.0, 0.0])
    cell = float(scale[0])
    # ModelTiepoint maps raster (i, j) -> model (x, y): tie = [i j k x y z]
    x0 = float(tie[3]) - float(tie[0]) * cell
    y1 = float(tie[4]) + float(tie[1]) * cell
    nod = one(42113)
    nodata = float(nod) if nod not in (None, "") else None
    return GeoTiffMeta(
        path=path, width=width, height=height, dtype=dtype, compression=comp,
        predictor=pred, tile_w=tile_w, tile_h=tile_h, tiled=tiled,
        offsets=offsets, bytecounts=bytecounts, x0=x0, y1=y1, cell=cell,
        nodata=nodata,
    )


def decode_block(buf: bytes, meta_dtype: str, compression: int, predictor: int,
                 tile_w: int, tile_h: int) -> np.ndarray:
    """One raw block -> (<=tile_h, tile_w) array (tile edge padding still
    in; a short LAST STRIP yields fewer rows — strips are not padded)."""
    if compression in (8, 32946):
        buf = zlib.decompress(buf)
    arr = np.frombuffer(buf, dtype=meta_dtype).reshape(-1, tile_w).copy()
    if predictor == 2:
        np.cumsum(arr, axis=1, dtype=arr.dtype, out=arr)
    return arr


def read_array(path: str) -> tuple[np.ndarray, GeoTiffMeta]:
    """Whole raster as one (height, width) array, NORTH row first (driver
    side — the reference's ``Raster.load``; use the Spark loader for
    mosaics that don't fit one machine)."""
    meta = read_meta(path)
    out = np.zeros((meta.height, meta.width), dtype=meta.dtype)
    with open(path, "rb") as f:
        for bi, (off, cnt) in enumerate(zip(meta.offsets, meta.bytecounts)):
            f.seek(off)
            blk = decode_block(
                f.read(cnt), meta.dtype, meta.compression, meta.predictor,
                meta.tile_w, meta.tile_h,
            )
            ty, tx = divmod(bi, meta.ntx)
            r0, c0 = ty * meta.tile_h, tx * meta.tile_w
            r1 = min(r0 + meta.tile_h, meta.height)
            c1 = min(c0 + meta.tile_w, meta.width)
            out[r0:r1, c0:c1] = blk[: r1 - r0, : c1 - c0]
    return out, meta


# --------------------------------------------------------------- writer

def write_geotiff(
    path: str,
    arr: np.ndarray,
    x0: float,
    y1: float,
    cell: float,
    *,
    compression: str = "deflate",
    tile: int = 256,
    strips: int | None = None,
    predictor: int = 1,
    nodata: float | None = None,
) -> None:
    """Single-band GeoTIFF writer (little-endian, deflate or raw; tiled
    by default, strip layout with ``strips`` rows per strip if given;
    optional horizontal-differencing ``predictor=2`` for int dtypes).
    ``arr[0]`` is the NORTH row, ``(x0, y1)`` the top-left corner —
    standard GeoTIFF orientation.  Exists so tests and pipelines can
    round-trip rasters without rasterio."""
    arr = np.ascontiguousarray(arr)
    dt = arr.dtype.newbyteorder("<")
    fmt = {"u": 1, "i": 2, "f": 3}[dt.kind]
    bits = dt.itemsize * 8
    h, w = arr.shape
    comp_id = 8 if compression == "deflate" else 1

    def pack(blk: np.ndarray) -> bytes:
        if predictor == 2:
            blk = blk.copy()
            blk[:, 1:] = np.diff(blk, axis=1)
        raw = blk.tobytes()
        return zlib.compress(raw, 6) if comp_id == 8 else raw

    blocks = []
    if strips is not None:
        for r0 in range(0, h, strips):
            blocks.append(pack(np.ascontiguousarray(arr[r0 : r0 + strips], dtype=dt)))
    else:
        ntx = (w + tile - 1) // tile
        nty = (h + tile - 1) // tile
        for ty in range(nty):
            for tx in range(ntx):
                blk = np.zeros((tile, tile), dtype=dt)
                r0, c0 = ty * tile, tx * tile
                r1, c1 = min(r0 + tile, h), min(c0 + tile, w)
                blk[: r1 - r0, : c1 - c0] = arr[r0:r1, c0:c1]
                blocks.append(pack(blk))

    data_start = 8
    offsets, pos = [], data_start
    for b in blocks:
        offsets.append(pos)
        pos += len(b)
    ifd_off = pos + (pos & 1)

    entries: list[tuple[int, int, int, bytes]] = []  # (tag, typ, cnt, payload)
    def add(tag, typ, vals, fmt_char):
        entries.append((tag, typ, len(vals), struct.pack("<%d%s" % (len(vals), fmt_char), *vals)))

    add(256, 4, [w], "I")
    add(257, 4, [h], "I")
    add(258, 3, [bits], "H")
    add(259, 3, [comp_id], "H")
    add(262, 3, [1], "H")
    add(277, 3, [1], "H")
    add(317, 3, [predictor], "H")
    if strips is not None:
        add(273, 4, offsets, "I")
        add(278, 4, [strips], "I")
        add(279, 4, [len(b) for b in blocks], "I")
    else:
        add(322, 3, [tile], "H")
        add(323, 3, [tile], "H")
        add(324, 4, offsets, "I")
        add(325, 4, [len(b) for b in blocks], "I")
    add(339, 3, [fmt], "H")
    add(33550, 12, [cell, cell, 0.0], "d")
    add(33922, 12, [0.0, 0.0, 0.0, x0, y1, 0.0], "d")
    if nodata is not None:
        nd = (repr(float(nodata)) + "\x00").encode("ascii")
        entries.append((42113, 2, len(nd), nd))
    entries.sort()

    n = len(entries)
    overflow_start = ifd_off + 2 + 12 * n + 4
    body = b""
    overflow = b""
    for tag, typ, cnt, payload in entries:
        if len(payload) <= 4:
            body += struct.pack("<HHI", tag, typ, cnt) + payload.ljust(4, b"\x00")
        else:
            body += struct.pack("<HHII", tag, typ, cnt, overflow_start + len(overflow))
            overflow += payload

    with open(path, "wb") as f:
        f.write(struct.pack("<2sHI", b"II", 42, ifd_off))
        for b in blocks:
            f.write(b)
        f.write(b"\x00" * (ifd_off - pos))
        f.write(struct.pack("<H", n) + body + struct.pack("<I", 0) + overflow)


# --------------------------------------------------------- spark loader

def geotiff_tiles_df(spark, path: str, bounds: tuple | None = None):
    """Raster file -> the engine's standard tile frame
    ``(tile_ix, tile_iy, ix0, iy0, nx, ny, payload)`` with int32
    payloads, south-up row order, and EXPLICIT cell origins ``ix0/iy0``
    (south-based) so edge blocks of any height stay grid-exact —
    drop-in for :func:`..operators.zonal.zonal_stats` with
    ``x0=meta.x0, y0=meta.y0, cell=meta.cell``.

    The driver ships only (block index, offset, bytecount) rows; each
    executor range-reads its own blocks.  ``bounds=(x0,y0,x1,y1)``
    prunes blocks BEFORE any payload IO (the reference's ``clip``).
    """
    from pyspark.sql import functions as F

    meta = read_meta(path)
    rows = []
    for bi, (off, cnt) in enumerate(zip(meta.offsets, meta.bytecounts)):
        ty, tx = divmod(bi, meta.ntx)
        nx = min(meta.tile_w, meta.width - tx * meta.tile_w)
        r0 = ty * meta.tile_h
        r1 = min(r0 + meta.tile_h, meta.height)
        ny = r1 - r0
        ix0 = tx * meta.tile_w
        iy0 = meta.height - r1  # south-based row of the block's bottom row
        rows.append((tx, meta.nty - 1 - ty, ix0, iy0, off, cnt, nx, ny))
    df = spark.createDataFrame(
        rows,
        "tile_ix int, tile_iy int, ix0 int, iy0 int, _off long, _cnt long, nx int, ny int",
    )
    if bounds is not None:
        bx0, by0, bx1, by1 = bounds
        c, gx0, gy0 = meta.cell, meta.x0, meta.y0
        df = df.filter(
            (F.lit(gx0) + F.col("ix0") * c <= bx1)
            & (F.lit(gx0) + (F.col("ix0") + F.col("nx")) * c >= bx0)
            & (F.lit(gy0) + F.col("iy0") * c <= by1)
            & (F.lit(gy0) + (F.col("iy0") + F.col("ny")) * c >= by0)
        )
    df = df.repartition(max(spark.sparkContext.defaultParallelism, 1))

    dtype, comp, pred = meta.dtype, meta.compression, meta.predictor
    tw, th, p = meta.tile_w, meta.tile_h, meta.path

    def kernel(it):
        with open(p, "rb") as f:
            for pdf in it:
                payloads = []
                for _, r in pdf.iterrows():
                    f.seek(int(r["_off"]))
                    blk = decode_block(f.read(int(r["_cnt"])), dtype, comp, pred, tw, th)
                    nx, ny = int(r["nx"]), int(r["ny"])
                    # crop edge padding, flip to south-up row order to
                    # match the synthetic tile convention ([j] = south+j)
                    payloads.append(
                        np.ascontiguousarray(blk[:ny, :nx][::-1]).astype("<i4").tobytes()
                    )
                out = pdf[["tile_ix", "tile_iy", "ix0", "iy0", "nx", "ny"]].copy()
                out["payload"] = payloads
                yield out

    return df.mapInPandas(
        kernel,
        schema="tile_ix int, tile_iy int, ix0 int, iy0 int, nx int, ny int, payload binary",
    )


class Raster:
    """File-backed raster facade (reference ``raster/raster.py:64-514``).

    >>> r = Raster.from_path(spark, "dem.tif")
    >>> r.clip((x0, y0, x1, y1)).zonal(munis)    # pruned before IO
    >>> r.sample(points_df)                      # cell value per point
    """

    def __init__(self, spark, meta: GeoTiffMeta, bounds: tuple | None = None):
        self.spark = spark
        self.meta = meta
        self._bounds = bounds

    @classmethod
    def from_path(cls, spark, path: str) -> "Raster":
        return cls(spark, read_meta(path))

    @property
    def bounds(self) -> tuple[float, float, float, float]:
        return self._bounds or self.meta.bounds

    def tiles(self):
        return geotiff_tiles_df(self.spark, self.meta.path, self._bounds)

    def clip(self, bounds: tuple) -> "Raster":
        b = self.bounds
        nb = (
            max(b[0], bounds[0]), max(b[1], bounds[1]),
            min(b[2], bounds[2]), min(b[3], bounds[3]),
        )
        return Raster(self.spark, self.meta, nb)

    def load(self) -> np.ndarray:
        """Full array, north row first (driver-side; reference ``load``)."""
        arr, _ = read_array(self.meta.path)
        return arr

    def zonal(self, polygons, key_col: str = "muni_id", geometry_col: str = "geometry"):
        from ..operators.zonal import zonal_stats

        return zonal_stats(
            polygons, self.tiles(), key_col, geometry_col,
            x0=self.meta.x0, y0=self.meta.y0, cell=self.meta.cell,
        )

    def sample(self, points, id_col: str = "uid", x_col: str = "x", y_col: str = "y"):
        """(id, value) per point — equi-join points to their tile (hash
        join on the tile index, no broadcastable raster assumption), then
        one vectorized gather per tile batch.  Points outside the raster
        extent drop out (rasterio sample's out-of-range behavior)."""
        import pandas as pd
        from pyspark.sql import functions as F

        m = self.meta
        # tile row from the TIFF (north-based) block grid: exact for any
        # height, including a partial bottom block
        pts = points.select(
            F.col(id_col).alias("_pid"),
            F.floor((F.col(x_col) - m.x0) / m.cell).cast("int").alias("_cix"),
            F.floor((F.col(y_col) - m.y0) / m.cell).cast("int").alias("_ciy"),
        ).filter(
            (F.col("_cix") >= 0) & (F.col("_cix") < m.width)
            & (F.col("_ciy") >= 0) & (F.col("_ciy") < m.height)
        ).withColumns(
            {
                "tile_ix": (F.col("_cix") / m.tile_w).cast("int"),
                "tile_iy": F.lit(m.nty - 1)
                - ((F.lit(m.height - 1) - F.col("_ciy")) / m.tile_h).cast("int"),
            }
        )
        joined = pts.join(self.tiles(), ["tile_ix", "tile_iy"], "inner")
        id_type = points.schema[id_col].dataType.simpleString()

        def kernel(it):
            for pdf in it:
                if not len(pdf):
                    continue
                vals = np.empty(len(pdf), dtype=np.float64)
                pdf = pdf.reset_index(drop=True)
                for _, idx in pdf.groupby(["tile_ix", "tile_iy"]).groups.items():
                    r = pdf.loc[idx[0]]
                    blk = np.frombuffer(bytes(r["payload"]), dtype="<i4").reshape(
                        int(r["ny"]), int(r["nx"])
                    )
                    jx = pdf.loc[idx, "_cix"].to_numpy() - int(r["ix0"])
                    jy = pdf.loc[idx, "_ciy"].to_numpy() - int(r["iy0"])
                    vals[np.asarray(idx)] = blk[jy, jx]
                yield pd.DataFrame({id_col: pdf["_pid"], "value": vals})

        return joined.mapInPandas(kernel, schema=f"{id_col} {id_type}, value double")
