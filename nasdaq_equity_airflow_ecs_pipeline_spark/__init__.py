"""PySpark-native analytics engine with the query/data-processing surface of
the reference NASDAQ equity pipeline (superwave135/nasdaq-equity-airflow-ecs-pipeline),
rebuilt Spark-first.

Layout
------
- ``session``    : SparkSession factory tuned for local[N] and cluster scale.
- ``schemas``    : explicit StructTypes (raw quote feed + star-schema tables).
- ``config``     : symbols, sector map, tier thresholds, paths.
- ``sources``    : JSONL partition reader, parquet/catalog tables, inline dims, mock feed.
- ``functions``  : scalar column helpers + oracle-stable aggregate builders.
- ``operators``  : dedup family (latest-wins, exact, MinHash-LSH, SimHash, n-gram
                   Jaccard, embedding near-dup), similarity search, text analysis,
                   sessionization, merge-upsert, multimodal binary plumbing.
- ``plans``      : the star-schema jobs (dimensions, fact, aggregations) + pipeline.
- ``quality``    : declarative data-quality checks (reference GX suite parity).
- ``streaming``  : Structured Streaming ingest with watermarks + windowed aggs.
"""

__version__ = "0.1.0"
