"""ClickHouse DDL → engine catalog translation.

The reference assumes target tables are created from a user-supplied
ClickHouse schema file (``Loader.Setup`` executes it verbatim,
/root/reference/db/db.go:212-229; the example workload's
``devel/schema.sql:1-12`` is MergeTree DDL).  For a user switching to
this engine, that schema file is the contract they already have — so
the engine parses ClickHouse ``CREATE TABLE`` statements directly into
``TableInfo`` entries: column types mapped to Spark types with the
same coercion targets as the reference's scan-type switch
(/root/reference/db/operations.go:150-193), primary key taken from
``PRIMARY KEY (...)`` or MergeTree ``ORDER BY`` (ClickHouse semantics:
PRIMARY KEY defaults to the ORDER BY key), default ``id``
(/root/reference/db/db.go:121-124).
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

from substreams_sink_clickhouse_spark.catalog import Catalog, TableInfo

#: ClickHouse scalar type → Spark type.  UInt64 maps to Decimal(20,0)
#: (full unsigned range does not fit a signed long — SURVEY §1.2).
_SCALARS: dict[str, T.DataType] = {
    "STRING": T.StringType(),
    "UUID": T.StringType(),
    "BOOL": T.BooleanType(),
    "BOOLEAN": T.BooleanType(),
    "INT8": T.ByteType(),
    "INT16": T.ShortType(),
    "INT32": T.IntegerType(),
    "INT64": T.LongType(),
    "UINT8": T.ShortType(),
    "UINT16": T.IntegerType(),
    "UINT32": T.LongType(),
    "UINT64": T.DecimalType(20, 0),
    "FLOAT32": T.FloatType(),
    "FLOAT64": T.DoubleType(),
    "DATE": T.DateType(),
    "DATE32": T.DateType(),
    "DATETIME": T.TimestampType(),
}


def parse_clickhouse_type(ch_type: str) -> T.DataType:
    """One ClickHouse column type → Spark type (raises on unknown —
    mirroring the reference's hard error on unknown tables rather than
    silently guessing)."""
    s = ch_type.strip()
    upper = s.upper()
    # wrapper types that do not change the storage type for our purposes
    for wrapper in ("NULLABLE", "LOWCARDINALITY"):
        if upper.startswith(wrapper + "("):
            return parse_clickhouse_type(s[len(wrapper) + 1 : -1])
    if upper in _SCALARS:
        return _SCALARS[upper]
    if upper.startswith("FIXEDSTRING("):
        return T.StringType()
    if upper.startswith("DATETIME64"):
        return T.TimestampType()
    if upper.startswith("DATETIME("):  # DateTime('UTC') — zone variant
        return T.TimestampType()
    if upper.startswith("ENUM8(") or upper.startswith("ENUM16("):
        return T.StringType()
    m = re.match(r"DECIMAL\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)", upper)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    m = re.match(r"ARRAY\((.*)\)$", s, re.IGNORECASE | re.DOTALL)
    if m:
        return T.ArrayType(parse_clickhouse_type(m.group(1)))
    m = re.match(r"MAP\((.*)\)$", s, re.IGNORECASE | re.DOTALL)
    if m:
        key_s, val_s = _split_top_level(m.group(1))
        return T.MapType(parse_clickhouse_type(key_s), parse_clickhouse_type(val_s))
    raise ValueError(f"unsupported ClickHouse type: {ch_type!r}")


def _split_top_level(s: str) -> tuple[str, str]:
    """Split 'K, V' at the top-level comma (Map type arguments)."""
    depth = 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            return s[:i], s[i + 1 :]
    raise ValueError(f"expected two type arguments in {s!r}")


_CREATE_RE = re.compile(
    r"CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?"
    r"(?P<name>[A-Za-z_][\w.]*)\s*\((?P<body>.*?)\)\s*"
    r"ENGINE\s*=\s*(?P<engine>\w+)(?:\((?P<eargs>[^)]*)\))?"
    # table-level clauses up to the end of this statement: a semicolon
    # OR the next statement (ClickHouse schema files often omit the
    # separator — the reference's devel/schema.sql does)
    r"(?P<tail>(?:(?!CREATE\s+TABLE|ALTER\s+TABLE|;).)*)",
    re.IGNORECASE | re.DOTALL,
)

#: Clauses that may follow ENGINE in any order (PARTITION BY / ORDER BY
#: / PRIMARY KEY / SAMPLE BY / TTL / SETTINGS).  Each captures up to the
#: next clause keyword so the clauses can be interleaved arbitrarily.
_TAIL_CLAUSE_RE = re.compile(
    r"(?P<kw>PARTITION\s+BY|ORDER\s+BY|PRIMARY\s+KEY|SAMPLE\s+BY|TTL|SETTINGS)\s+"
    r"(?P<expr>.*?)(?=PARTITION\s+BY|ORDER\s+BY|PRIMARY\s+KEY|SAMPLE\s+BY|TTL|SETTINGS|$)",
    re.IGNORECASE | re.DOTALL,
)


def _first_key_column(expr: str) -> str:
    """First column of an ORDER BY / PRIMARY KEY expression:
    ``(a, b)`` → a, ``a`` → a, ``tuple()`` → '' (no key)."""
    s = expr.strip().strip(";").strip()
    if s.lower().startswith("tuple"):
        s = s[5:].strip()
    s = s.strip("()").split(",")[0].strip().strip('`"')
    return s


def _split_columns(body: str) -> list[str]:
    """Split the column-definition body on top-level commas."""
    parts, depth, cur = [], 0, []
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur and "".join(cur).strip():
        parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def parse_clickhouse_ddl(ddl: str) -> list[TableInfo]:
    """Parse every ``CREATE TABLE ... ENGINE = ...`` statement in a
    ClickHouse schema file into :class:`TableInfo` entries."""
    tables: list[TableInfo] = []
    for m in _CREATE_RE.finditer(ddl):
        name = m.group("name").split(".")[-1]
        fields: list[T.StructField] = []
        primary_key: str | None = None
        for part in _split_columns(m.group("body")):
            pk_m = re.match(r"PRIMARY\s+KEY\s*\(\s*([\w`\"]+)\s*\)", part, re.IGNORECASE)
            if pk_m:
                primary_key = pk_m.group(1).strip('`"')
                continue
            col_m = re.match(r"([\w`\"]+)\s+(.+)", part, re.DOTALL)
            if not col_m:
                raise ValueError(f"table {name!r}: cannot parse column {part!r}")
            col = col_m.group(1).strip('`"')
            # drop column-level options (DEFAULT/CODEC/COMMENT/TTL)
            type_s = re.split(
                r"\s+(?:DEFAULT|MATERIALIZED|CODEC|COMMENT|TTL)\b",
                col_m.group(2).strip(),
                flags=re.IGNORECASE,
            )[0].strip()
            fields.append(T.StructField(col, parse_clickhouse_type(type_s), True))
        # Table-level clauses after ENGINE (in any order): PARTITION BY /
        # ORDER BY / PRIMARY KEY / SAMPLE BY / TTL / SETTINGS.  ClickHouse
        # semantics: PRIMARY KEY defaults to the ORDER BY key.
        order_key: str | None = None
        for cm in _TAIL_CLAUSE_RE.finditer(m.group("tail") or ""):
            kw = re.sub(r"\s+", " ", cm.group("kw").upper())
            if kw == "PRIMARY KEY" and primary_key is None:
                primary_key = _first_key_column(cm.group("expr")) or None
            elif kw == "ORDER BY":
                order_key = _first_key_column(cm.group("expr")) or None
        if primary_key is None and order_key:
            primary_key = order_key
        if primary_key is None:
            primary_key = "id"  # reference default, db/db.go:121-124
        engine = m.group("engine")
        version_column: str | None = None
        sum_columns: list[str] | None = None
        eargs = (m.group("eargs") or "").strip().strip("()").strip()
        if engine.upper() == "REPLACINGMERGETREE" and eargs:
            # ReplacingMergeTree(ver) / ReplacingMergeTree(ver, is_deleted):
            # the first argument is the version column.
            version_column = eargs.split(",")[0].strip().strip('`"')
        elif engine.upper() == "SUMMINGMERGETREE" and eargs:
            # SummingMergeTree(col) / SummingMergeTree((a, b))
            sum_columns = [c.strip().strip('`"') for c in eargs.split(",") if c.strip()]
        fields = [
            T.StructField(f.name, f.dataType, nullable=(f.name != primary_key))
            for f in fields
        ]
        tables.append(
            TableInfo(
                name,
                T.StructType(fields),
                primary_key=primary_key,
                engine=engine,
                version_column=version_column,
                sum_columns=sum_columns,
            )
        )
    return tables


_ALTER_ADD_RE = re.compile(
    r"ALTER\s+TABLE\s+(?P<name>[A-Za-z_][\w.]*)\s+ADD\s+COLUMN\s+"
    r"(?P<ine>IF\s+NOT\s+EXISTS\s+)?(?P<col>[\w`\"]+)\s+(?P<type>[^;,\n]+)",
    re.IGNORECASE,
)


def catalog_from_clickhouse_ddl(ddl: str) -> Catalog:
    """Build an engine catalog straight from a ClickHouse schema file —
    the drop-in path for a reference deployment's existing schema.
    ``ALTER TABLE ... ADD COLUMN`` statements (the migrations such a
    deployment accumulates) are applied on top of the CREATEs."""
    catalog = Catalog()
    for info in parse_clickhouse_ddl(ddl):
        catalog.register(info)
    for m in _ALTER_ADD_RE.finditer(ddl):
        name = m.group("name").split(".")[-1]
        col = m.group("col").strip('`"')
        type_s = re.split(
            r"\s+(?:DEFAULT|MATERIALIZED|CODEC|COMMENT|TTL|AFTER|FIRST)\b",
            m.group("type").strip(),
            flags=re.IGNORECASE,
        )[0].strip()
        if m.group("ine") and col in catalog.get(name).schema.fieldNames():
            continue
        catalog.add_column(name, col, parse_clickhouse_type(type_s))
    return catalog


def clickhouse_type_name(dtype: T.DataType) -> str:
    """Spark type → ClickHouse type name (inverse of
    :func:`parse_clickhouse_type`, for the system-catalog views)."""
    if isinstance(dtype, T.DecimalType):
        if (dtype.precision, dtype.scale) == (20, 0):
            return "UInt64"
        return f"Decimal({dtype.precision}, {dtype.scale})"
    if isinstance(dtype, T.ArrayType):
        return f"Array({clickhouse_type_name(dtype.elementType)})"
    if isinstance(dtype, T.MapType):
        return (
            f"Map({clickhouse_type_name(dtype.keyType)}, "
            f"{clickhouse_type_name(dtype.valueType)})"
        )
    simple = {
        T.StringType(): "String",
        T.BooleanType(): "Bool",
        T.ByteType(): "Int8",
        T.ShortType(): "Int16",
        T.IntegerType(): "Int32",
        T.LongType(): "Int64",
        T.FloatType(): "Float32",
        T.DoubleType(): "Float64",
        T.DateType(): "Date",
        T.TimestampType(): "DateTime",
    }
    if dtype in simple:
        return simple[dtype]
    raise ValueError(f"no ClickHouse name for Spark type {dtype!r}")


def register_system_views(spark, catalog: Catalog, database: str = "default") -> None:
    """Expose the catalog as ClickHouse-style system tables so the
    reference's own introspection queries work against the engine
    (it discovers tables via ``SELECT name FROM system.tables`` and
    primary keys via ``system.columns ... is_in_primary_key ORDER BY
    position``, /root/reference/db/operations.go:211-277).  Spark view
    names cannot contain dots, so ``system.tables`` / ``system.columns``
    map to ``system_tables`` / ``system_columns``.
    """
    tables_rows = []
    columns_rows = []
    for info in catalog.tables.values():
        tables_rows.append((database, info.name, info.engine))
        for pos, f in enumerate(info.schema.fields, start=1):
            columns_rows.append(
                (
                    database,
                    info.name,
                    f.name,
                    clickhouse_type_name(f.dataType),
                    pos,
                    f.name == info.primary_key,
                )
            )
    spark.createDataFrame(
        tables_rows, "database string, name string, engine string"
    ).createOrReplaceTempView("system_tables")
    spark.createDataFrame(
        columns_rows,
        "database string, table string, name string, type string, "
        "position int, is_in_primary_key boolean",
    ).createOrReplaceTempView("system_columns")


# -------------------------------------------------------- DDL export

#: Spark type -> canonical ClickHouse type for DDL rendering (the
#: inverse of _SCALARS; lossy wrappers like LowCardinality are not
#: reconstructed).
_RENDER_TYPES: dict[type, str] = {
    T.StringType: "String",
    T.BooleanType: "Bool",
    T.ByteType: "Int8",
    T.ShortType: "Int16",
    T.IntegerType: "Int32",
    T.LongType: "Int64",
    T.FloatType: "Float32",
    T.DoubleType: "Float64",
    T.DateType: "Date",
    T.TimestampType: "DateTime",
}


def render_clickhouse_type(dt: T.DataType) -> str:
    """One Spark type → ClickHouse DDL type text."""
    if isinstance(dt, T.DecimalType):
        if (dt.precision, dt.scale) == (20, 0):
            return "UInt64"
        return f"Decimal({dt.precision}, {dt.scale})"
    if isinstance(dt, T.ArrayType):
        return f"Array({render_clickhouse_type(dt.elementType)})"
    r = _RENDER_TYPES.get(type(dt))
    if r is None:
        raise ValueError(f"no ClickHouse rendering for Spark type {dt}")
    return r


def render_clickhouse_ddl(info) -> str:
    """``SHOW CREATE TABLE`` parity: render a catalog ``TableInfo``
    back to ClickHouse DDL — the inverse of
    :func:`catalog_from_clickhouse_ddl`, so schemas round-trip between
    the engine and a real ClickHouse deployment
    (``catalog_from_clickhouse_ddl(render_clickhouse_ddl(t))`` yields
    the same TableInfo; tested in test_clickhouse_ddl.py)."""
    cols = ",\n".join(
        f"    {f.name} {render_clickhouse_type(f.dataType)}"
        for f in info.schema.fields
    )
    if info.engine == "ReplacingMergeTree" and info.version_column:
        engine = f"ReplacingMergeTree({info.version_column})"
    elif info.engine == "SummingMergeTree" and info.sum_columns:
        engine = f"SummingMergeTree(({', '.join(info.sum_columns)}))"
    else:
        engine = f"{info.engine}()"
    return (
        f"CREATE TABLE {info.name}\n(\n{cols},\n"
        f"    PRIMARY KEY ({info.primary_key})\n)\n"
        f"ENGINE = {engine}\nORDER BY {info.primary_key};"
    )
