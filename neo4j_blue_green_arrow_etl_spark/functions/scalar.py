"""Scalar column functions mirroring the reference's function surface
(SURVEY §2.8 F1-F13), as reusable Catalyst expressions.

All are thin compositions of built-in ``pyspark.sql.functions`` — they
exist so call sites use ONE definition of e.g. "the timestamp suffix of
a database name" instead of re-deriving it (the reference re-implements
that parse in three places: orchestrator.py:377-379, 399-400,
simulate_snapshot.py:79)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def split_labels(col: Column | str) -> Column:
    """F1/F13: comma-separated label string -> array<string>; a single
    label becomes a one-element array (reference neo4j_pq.py:48-51)."""
    return F.split(F.col(col).cast("string") if isinstance(col, str) else col.cast("string"), ",")


def db_name_col(customer: Column | str, timestamp: Column | str) -> Column:
    """F2: ``{customer}-{timestamp}`` database identity (reference
    load_with_aliases.py:48)."""
    return F.concat_ws("-", F.col(customer) if isinstance(customer, str) else customer,
                       F.col(timestamp) if isinstance(timestamp, str) else timestamp)


def db_timestamp(name: Column | str) -> Column:
    """F3/F9: integer timestamp suffix of a database name (reference
    orchestrator.py:377-379)."""
    c = F.col(name) if isinstance(name, str) else name
    return F.element_at(F.split(c, "-"), -1).cast("long")


def db_customer(name: Column | str) -> Column:
    """Everything before the final ``-`` (customer ids may contain dashes
    in principle; the reference's split()[-1] convention implies this)."""
    c = F.col(name) if isinstance(name, str) else name
    return F.regexp_extract(c, r"^(.*)-\d+$", 1)


def b64(col: Column | str) -> Column:
    """F12: binary -> RFC 4648 base64 string (reference
    neo4j_arrow_client.py:345 encodes basic-auth tokens this way).

    Spark's ``base64`` emits MIME chunked output (CRLF every 76 chars);
    the reference (and DuckDB's ``to_base64``) use the unchunked form,
    so the line breaks are stripped. ``unbase64`` accepts both forms.
    """
    raw = F.base64(F.col(col) if isinstance(col, str) else col)
    return F.regexp_replace(raw, "[\\r\\n]", "")


def mib(bytes_col: Column | str) -> Column:
    """F10: bytes -> MiB via shift (reference load_with_aliases.py:134)."""
    c = F.col(bytes_col) if isinstance(bytes_col, str) else bytes_col
    return F.shiftright(c.cast("long"), 20)


def throughput(rows: Column | str, seconds: Column | str) -> Column:
    """A5: rows/sec with divide-by-zero guarded to null (reference
    load_with_aliases.py:133-137)."""
    r = F.col(rows) if isinstance(rows, str) else rows
    s = F.col(seconds) if isinstance(seconds, str) else seconds
    return r / F.nullif(s.cast("double"), F.lit(0.0))
