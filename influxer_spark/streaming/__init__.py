from influxer_spark.streaming.incremental import (  # noqa: F401
    run_incremental_lineprotocol_rollup,
    run_incremental_rollup,
    stream_rollup_1m,
    read_tier,
)
