"""nyc_taxi_lakehouse_spark — a PySpark-native analytics engine.

Re-implements, Spark-first, the query and data-processing capabilities of the
reference lakehouse (NguyenVuDataMind/NYC_Taxi_Lakehouse): batch ETL with
cleaning filters, SQL analytics marts (joins/aggregations/window functions),
streaming CDC with watermarked tumbling windows, serving queries — plus the
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns) the reference lacks.

Architecture: everything is declared through the DataFrame / Spark SQL API so
Catalyst owns the physical plan (predicate pushdown, column pruning, broadcast
joins, AQE). No RDDs; Python UDFs only where built-ins genuinely cannot
express the semantics (Arrow-batched, never per-row).
"""

__version__ = "0.1.0"
