"""``python -m substreams_sink_clickhouse_spark`` entry point."""

from substreams_sink_clickhouse_spark.cli import main

raise SystemExit(main())
