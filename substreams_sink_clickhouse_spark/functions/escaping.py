"""SQL identifier/value escaping for the optional ClickHouse text-SQL
sink.

The native Spark path never builds SQL strings from data, so injection
is structurally impossible; these helpers exist only for parity with
the reference's generated ``INSERT``/``ALTER``/``DELETE`` statements
(/root/reference/db/operations.go:195-209) in the JDBC/HTTP sink.
"""

from __future__ import annotations


def escape_identifier(name: str) -> str:
    """Double-quote an identifier, doubling embedded quotes
    (reference: db/operations.go:195-201)."""
    return '"' + name.replace('"', '""') + '"'


def escape_value(value: str) -> str:
    """Single-quote a value, doubling embedded quotes
    (reference: db/operations.go:203-209)."""
    return "'" + value.replace("'", "''") + "'"
