"""c_tran_data_pipeline_spark — a PySpark-native analytics engine.

Re-creates the capabilities of the reference Kafka→Postgres transit-telemetry
pipeline (ebele66/C-Tran_Data_Pipeline) as an idiomatic Spark engine:

- declarative DataFrame/SQL plans (Catalyst optimizes; we do not hand-schedule)
- Structured Streaming for the ingest pipelines (E1/E2 in SURVEY.md §3)
- conform/validate/upsert semantics as pure Column-expression functions
- large-scale training-data extensions: dedup (exact/MinHash-LSH/SimHash/
  n-gram-Jaccard/embedding), similarity search, text analysis, multimodal
  column plumbing.

Design scale is a 1000-executor cluster over ~100 TB: every operator is
shuffle-conscious (broadcast small dims, partial aggregation, pushdown-friendly
scans, no driver-side collect loops).
"""

from c_tran_data_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
