"""topk_spark — a PySpark-native analytics engine with the capabilities of
the reference stack ``znoori455/topk-pinot-flink`` (Kafka → Flink dedup/rollup
→ Pinot top-k serving), re-expressed Spark-first:

- Catalyst/DataFrame SQL replaces Pinot's query engine,
- Structured Streaming replaces Flink's DataStream pipeline,
- Parquet layout (partition/sort/bloom) replaces Pinot's index config,
- explicit rollup tables replace Pinot's star-tree pre-aggregation.

See SURVEY.md for the full operator inventory (§2) and build plan (§7).
"""

__version__ = "0.1.0"
