"""transcript-lakehouse: a from-scratch PySpark-native table-maintenance engine.

Re-expresses the capabilities of CESID (`JrJessyLuo/mv_imputation_datalake`,
read-only reference at /root/reference) as idiomatic Spark over an
Iceberg-style table format implemented in plain Python + Parquet:

- ``engine.format``     snapshot log / manifests / atomic commit (from scratch)
- ``engine.scan``       snapshot-pinned reads with manifest min/max file pruning
- ``engine.synth``      deterministic transcript generator (FIXTURES.md #1)
- ``engine.index``      candidate-index builder (CESID offline index, recast)
- ``engine.merge``      copy-on-write MERGE INTO + impute stage (CESID online
                        search/estimation, recast as one broadcast lookup join)
- ``engine.maintain``   bin-packing compaction, clustering, manifest rewrite,
                        snapshot expiry + orphan sweep
- ``engine.layout``     Z-order / Hilbert 64-bit interleave (vectorized)
- ``engine.skew``       hot-key detection + salted two-phase aggregation
- ``engine.checkpoint`` per-task checkpoint manifests (lineage + metrics)
- ``engine.ops``        training-data-pipeline operators (dedup, similarity
                        search, text analysis, multimodal plumbing)
"""

__version__ = "0.1.0"
