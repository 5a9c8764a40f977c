"""influxer_spark — a PySpark-native time-series rollup / downsample / retention
engine with the data-processing capabilities of AdysTech/Influxer (reference at
/root/reference, C#), re-expressed Spark-first.

Where the reference parses delimited time-series logs into tagged, typed points
(Influxer/GenericFile.cs, Influxer/PerfmonFile.cs) and delegates rollup,
retention and compression to an InfluxDB server, this package implements the
full pipeline natively on Spark DataFrames:

- ``sources``    — ingest parity: GenericFile / Perfmon semantics + pages table
- ``functions``  — scalar transform pipeline (F1-F13 of SURVEY.md §2.3),
                   identifier scrub, text analysis
- ``operators``  — rollup tier cascade, gap-fill + interpolation, Gorilla
                   XOR / delta-of-delta codec, retention DAG, checkpoints,
                   dedup + similarity search
- ``extract``    — Arrow-vectorized html→text extraction + crawl metrics
- ``datagen``    — deterministic Common-Crawl-style pages generator
- ``refmodel``   — pure-Python oracle of the reference's parse semantics
"""

__version__ = "0.1.0"
