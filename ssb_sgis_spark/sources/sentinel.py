"""Sentinel-2 metadata surface (reference ``raster/sentinel.py:6-43``).

The reference's ``Sentinel2(Raster)`` is a thin metadata subclass: band
defaults (``nodata=0``, ``dtype=uint16``, ``band_index=1``), a band-name
regex and acquisition-date regex applied to the FILENAME (reference
``raster/raster.py:766-791``), the band→color mapping, and an
``is_mask`` path test.  No pixel semantics change — so the engine
mirrors it as (a) the same facade subclass over the file-backed
:class:`~.geotiff.Raster` and (b) a *distributed catalog*: at lake scale
you have millions of tile files, and the first job is always "which
files do I even read" — a relational problem, not an IO one.
:func:`sentinel2_catalog` answers it with native ``regexp_extract``
expressions over the path column (zero file IO), so band/date/tile
pruning happens before a single byte of raster payload is touched;
:func:`enrich_catalog_headers` then parses the few-KB TIFF headers of
the SURVIVING files in executors via ``mapInPandas``.
"""

from __future__ import annotations

import os
import re

import numpy as np

from .geotiff import Raster, read_meta

# Public ESA band semantics (reference sentinel.py:7-21).
BAND_COLORS = {
    "B1": "coastal aerosol",
    "B2": "blue",
    "B3": "green",
    "B4": "red",
    "B5": "vegetation red edge",
    "B6": "vegetation red edge",
    "B7": "vegetation red edge",
    "B8": "nir",
    "B8A": "narrow nir",
    "B9": "water vapour",
    "B10": "swir - cirrus",
    "B11": "swir",
    "B12": "swir",
}

NAME_REGEX = r"B\d{1,2}A|B\d{1,2}"
DATE_REGEX = r"20\d{6}"


def _normalize_band(band: str | None) -> str | None:
    """``B04`` → ``B4`` (SAFE filenames zero-pad; the color table doesn't)."""
    if not band:
        return None
    m = re.fullmatch(r"B0?(\d{1,2})(A?)", band)
    return f"B{m.group(1)}{m.group(2)}" if m else band


class Sentinel2(Raster):
    """File-backed Sentinel-2 raster with filename-derived metadata.

    >>> s2 = Sentinel2.from_path(spark, ".../T32VNM_20230601_B04.tif")
    >>> s2.name, s2.date, s2.band_color
    ('B04', '20230601', 'red')
    """

    nodata = 0
    dtype = np.uint16
    band_index = 1
    name_regex = NAME_REGEX
    date_regex = DATE_REGEX
    shortname = "sentinel2"

    @property
    def _filename(self) -> str:
        return os.path.basename(self.meta.path)

    @property
    def name(self) -> str | None:
        """Band name from the filename (reference raster.py:766-774)."""
        m = re.search(self.name_regex, self._filename)
        return m.group() if m else None

    @property
    def date(self) -> str | None:
        m = re.search(self.date_regex, self._filename)
        return m.group() if m else None

    @property
    def tile(self) -> str | None:
        """``f"{int(minx)}{int(miny)}"`` (reference raster.py:749-752)."""
        b = self.bounds
        return f"{int(b[0])}{int(b[1])}" if b is not None else None

    @property
    def raster_id(self) -> str:
        parts = [self.shortname, self.tile or "", self.date or "", self.name or ""]
        return "_".join(parts).replace("__", "_").strip("_")

    @property
    def band_color(self) -> str | None:
        return BAND_COLORS.get(_normalize_band(self.name))

    @property
    def is_mask(self) -> bool:
        return "masks" in str(self.meta.path).lower()


def sentinel2_catalog(spark, paths: list[str]):
    """Paths → metadata DataFrame with ZERO file IO.

    Columns ``(path, band, band_color, date, is_mask)`` — band/date by
    ``regexp_extract`` (native, codegen), color via a broadcast-size map
    literal.  Filter this frame first; only then pay header/payload IO
    on what survives.  At 10^6 files this is one narrow stage.
    """
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(p,) for p in paths], "path string")
    fname = F.element_at(F.split(F.col("path"), "/"), -1)
    color_map = F.create_map(
        *[F.lit(x) for kv in BAND_COLORS.items() for x in kv]
    )
    band = F.regexp_extract(fname, NAME_REGEX, 0)
    # B04 -> B4 (native mirror of _normalize_band)
    norm = F.concat(
        F.lit("B"),
        F.regexp_replace(F.regexp_extract(band, r"B(0?\d{1,2}A?)", 1), "^0", ""),
    )
    return df.select(
        "path",
        F.nullif(band, F.lit("")).alias("band"),
        F.element_at(color_map, norm).alias("band_color"),
        F.nullif(F.regexp_extract(fname, DATE_REGEX, 0), F.lit("")).alias("date"),
        F.lower(F.col("path")).contains("masks").alias("is_mask"),
    )


def enrich_catalog_headers(catalog):
    """Add ``(width, height, cell, minx, miny, maxx, maxy, tile)`` by
    parsing each surviving file's TIFF header (a few KB) in executors.

    Runs AFTER the relational prune — the point of the two-stage design:
    pruning a million-file catalog costs no IO; header IO is paid only
    for selected bands/dates.
    """
    import pandas as pd

    def parse(it):
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                m = read_meta(r["path"])
                rows.append(
                    dict(
                        r,
                        width=m.width,
                        height=m.height,
                        cell=m.cell,
                        minx=m.x0,
                        miny=m.y1 - m.height * m.cell,
                        maxx=m.x0 + m.width * m.cell,
                        maxy=m.y1,
                        tile=f"{int(m.x0)}{int(m.y1 - m.height * m.cell)}",
                    )
                )
            yield pd.DataFrame(rows) if rows else pdf.head(0)

    schema = (
        catalog.schema.simpleString()[7:-1]
        + ",width int,height int,cell double,minx double,miny double,"
        + "maxx double,maxy double,tile string"
    )
    return catalog.mapInPandas(parse, schema=schema)
