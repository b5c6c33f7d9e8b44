"""ssb_sgis_spark — a from-scratch PySpark-native spatial-join + tiling
engine with the query/data-processing capabilities of ssb-sgis
(Bjoern-Rapp/ssb-sgis, surveyed in /root/repo/SURVEY.md).

Geometry = WKB BinaryType columns; point tables carry native x/y doubles;
all geometry math is vectorized numpy inside Arrow-batched UDFs (this
environment has no GEOS/shapely — the kernels are original).
"""

from .cells import cell_of_xy_col, ssb_grid_id_col

__all__ = ["cell_of_xy_col", "ssb_grid_id_col"]
__version__ = "0.1.0"
