"""S7 — audit-log text loader (ref tools auditparser:
DatabaseHelper.java parses log lines into an ``audit`` table; DDL
commands.properties:18-19).

``parse_audit_lines`` turns raw log text into the typed audit table via
one regexp per field — a map-only pass; at scale this reads
``spark.read.text`` over the raw log prefix and the regex runs in
codegen, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# reference-ish line shape:
#   2021-01-01 10:00:00 | INFO | OMAudit | user=alice | ip=1.2.3.4 |
#   op=CREATE_KEY | {params} | ret=SUCCESS
# op is [^|]*? (not \S+) — reference op names are words, but the audit
# surface must tolerate ops containing spaces
LINE_RE = (
    r"^(\S+ \S+) \| (\w+) \| (\w+) \| user=(\S+) \| ip=(\S+) \| "
    r"op=([^|]*?) \| (.*) \| ret=(\w+)$"
)


def format_audit_lines(audit: DataFrame) -> DataFrame:
    """Render typed audit rows back to log-line text (the generator for
    round-trip tests; production ingests real OM audit files)."""
    return audit.select(
        F.concat(
            F.date_format("datetime", "yyyy-MM-dd HH:mm:ss"),
            F.lit(" | INFO | OMAudit | user="), F.col("user"),
            F.lit(" | ip=10.0.0.1 | op="), F.col("op"),
            F.lit(" | {} | ret="), F.col("result"),
        ).alias("value")
    )


def parse_audit_lines(lines: DataFrame, value_col: str = "value") -> DataFrame:
    v = F.col(value_col)
    return lines.select(
        F.to_timestamp(F.regexp_extract(v, LINE_RE, 1)).alias("datetime"),
        F.regexp_extract(v, LINE_RE, 2).alias("level"),
        F.regexp_extract(v, LINE_RE, 3).alias("logger"),
        F.regexp_extract(v, LINE_RE, 4).alias("user"),
        F.regexp_extract(v, LINE_RE, 5).alias("ip"),
        F.regexp_extract(v, LINE_RE, 6).alias("op"),
        F.regexp_extract(v, LINE_RE, 7).alias("params"),
        F.regexp_extract(v, LINE_RE, 8).alias("result"),
    )
