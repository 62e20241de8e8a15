"""Timestamp helpers shared across operators and oracles-facing queries."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def unix_micros_ntz(c: Column | str) -> Column:
    """Microseconds-since-epoch of a TIMESTAMP_NTZ column.

    ``unix_micros`` requires TIMESTAMP; the cast applies a session-timezone
    offset, which is harmless only because every consumer either pins the
    session to UTC or uses the value in a DIFFERENCE where the offset
    cancels. Centralized so the NTZ-cast subtlety lives in one place."""
    col = F.col(c) if isinstance(c, str) else c
    return F.unix_micros(col.cast("timestamp"))
