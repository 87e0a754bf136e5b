"""cosmoz_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query & data-processing
capabilities of CSIRO's cosmoz-data-pipeline (reference at
/root/reference, cited by file:line in docstrings) as an idiomatic
Apache Spark engine: declarative DataFrame/SQL plans optimized by
Catalyst, columnar Parquet scans, broadcast dimension joins,
window-function temporal logic, and Structured Streaming for the
incremental layer.

Design goals (in priority order):
1. Correctness parity with the reference's level1..level4 semantics
   (pipeline/cosmoz_process_levels.py) including its quirks.
2. 100 TB scale: no driver-side loops, no row-at-a-time Python in the
   hot path, broadcastable dimensions, single-shuffle temporal joins,
   partition pruning on (site_no, date).
3. LLM-training-data extensions: dedup (exact/MinHash-LSH/SimHash/
   n-gram Jaccard), similarity search, text analysis, multimodal
   column plumbing.
"""

__version__ = "0.1.0"
