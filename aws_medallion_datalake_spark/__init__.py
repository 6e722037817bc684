"""PySpark-native medallion lakehouse table-maintenance engine.

A from-scratch re-expression of the capabilities of the reference repo
``01001102/aws-medallion-datalake`` (an AWS Glue/Step Functions medallion
lakehouse — see SURVEY.md) as a single idiomatic-PySpark library:

- ``sources``   — Iceberg-style table format (snapshots, manifests, atomic
                  commits, stats-pruned scans) + deterministic synthetic
                  image+caption generator.
- ``functions`` — vectorized kernels: numpy PNG/lossy codec, perceptual hash,
                  Morton/Hilbert clustering keys (pandas/Arrow UDFs only —
                  no per-row Python).
- ``plans``     — driver-side planners: bin-packing compaction plan,
                  manifest min/max file pruning, merge copy-on-write plan.
- ``operators`` — maintenance operators: compaction, Z-order/Hilbert
                  clustering, MERGE INTO (broadcast-CoW, AQE skew), snapshot expiry
                  with reachability GC, checkpointed/resumable runs.
- ``pipeline``  — medallion bronze→silver→gold stages over the image table,
                  mirroring the reference's stage semantics
                  (scripts/bronze_digit.py, silver_digit_clean.py,
                  gold_digit_fixed.py) Spark-first.
- ``streaming`` — Structured Streaming ingest of the events table
                  (watermark + windowed aggregation), the streaming analogue
                  of the reference's watermark-batch incremental loads.
"""

__version__ = "0.1.0"
