"""Optional external sinks (ClickHouse text-SQL / JDBC)."""
