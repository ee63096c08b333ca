"""qcfractal_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of MolSSI/QCFractal.

The reference (read-only at /root/reference) is a results warehouse whose
query surface is SQLAlchemy-on-PostgreSQL plus a pandas client layer.  This
package re-expresses every operator in that surface (SURVEY.md §2) as
idiomatic Spark DataFrame/SQL plans: declarative logical plans, Catalyst
optimization, broadcast joins for small dimensions, exact percentiles,
window-based argmin, iterative graph closure, and Structured-Streaming
analogs for the incremental dataflows.

Layout
------
- ``session``    : tuned SparkSession builders (AQE, shuffle partitions, UTC)
- ``catalog``    : table registry over the parquet test tables
- ``plans``      : query-filter builder (the reference's pydantic
                   ``RecordQueryFilters`` surface, compiled to Columns)
- ``operators``  : keyed access, joins, aggregations, graph closure, top-k,
                   pivot/dataset-matrix ops
- ``functions``  : scalar helpers, text analysis, dedup (exact/MinHash/
                   SimHash/Jaccard), embedding similarity, multimodal stubs
- ``sources``    : parquet read/write, snapshot export
- ``streaming``  : structured-streaming ingest/enrichment/rollup analogs
"""

__version__ = "0.1.0"
