"""crawler_spark — a PySpark-native distributed URL-frontier / fetch / parse
engine with the capabilities of ``oi-archive/crawler`` (reference at
/root/reference, read-only), rebuilt Spark-first per SURVEY.md.

Layout
------
- ``session``    SparkSession factory tuned for the crawl workload.
- ``schemas``    StructTypes for frontier / url_seen / host_state / problems /
                 images / fetch_log / lineage (FIXTURES.md A1-A6).
- ``functions/`` pure column-expression function library (URL canon, keys,
                 hashing, text) — zero per-row Python.
- ``sources/``   synthetic web (deterministic fetcher universe), warehouse
                 (parquet-dir table layer, Iceberg drop-in), image codecs.
- ``operators/`` frontier scheduling, membership (bloom/cuckoo + anti-join),
                 fetch, parse, dedup (exact/minhash/simhash/jaccard/cosine),
                 similarity search, text analysis, multimodal.
- ``plans/``     the generation loop (select → fetch → parse → commit) and
                 resume-from-checkpoint logic.
- ``streaming/`` Structured Streaming variant (foreachBatch crawl loop).
"""

__version__ = "0.1.0"
