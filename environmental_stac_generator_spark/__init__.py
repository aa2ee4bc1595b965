"""environmental_stac_generator_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of ``environmental-forecasting/environmental-stac-generator``
(the reference, a single-node NetCDF→COG/STAC ETL pipeline) as
idiomatic Spark DataFrame / SQL operators, designed for 100 TB scale:

- the relational core (projections, filters, joins, upserts,
  aggregations, window ops, array/pivot ops, scalar functions) is pure
  built-in DataFrame/SQL so Catalyst + AQE optimize it;
- the non-relational kernels (NetCDF explode, COG encode, thumbnail
  render) are Arrow-batched pandas UDFs over ``mapInPandas`` /
  ``applyInPandas``;
- sinks (STAC JSON tree, JDBC upsert) are partition-parallel writers.

See SURVEY.md for the full operator inventory and the reference
file:line citations carried in each module's docstrings.
"""

__version__ = "0.1.0"

from environmental_stac_generator_spark.session import get_spark  # noqa: F401
