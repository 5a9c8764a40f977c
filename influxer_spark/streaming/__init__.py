from influxer_spark.streaming.incremental import (  # noqa: F401
    read_alerts,
    read_kmv,
    read_sessions,
    read_tier,
    run_alert_stream,
    run_incremental_heavy_hitters,
    run_incremental_kmv,
    run_incremental_lineprotocol_rollup,
    run_incremental_rollup,
    run_incremental_sessions,
    stream_rollup_1m,
)
