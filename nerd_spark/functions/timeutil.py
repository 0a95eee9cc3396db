"""Time/date helpers (SURVEY §2.7).

Policy: naive UTC everywhere (session timezone pinned to UTC in
session.py), mirroring the reference's datetime discipline
(reference: common/utils.py:24-36 parse_rfc_time normalizes RFC3339
to naive UTC; common/task_queue.py:92-95 refuses tz-aware values).
Per-day buckets are ISO 'YYYY-MM-DD' strings compared lexically
(reference: NERDd/modules/event_type_counter.py:76-78).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def parse_rfc_time(col: Column | str) -> Column:
    """RFC3339 string -> timestamp normalized to UTC.

    Spark's to_timestamp handles the offset forms ('Z', '+hh:mm')
    when the session TZ is UTC; fractional seconds optional.
    """
    return F.to_timestamp(_c(col))


def date_str(col: Column | str) -> Column:
    """timestamp -> ISO date string (reference: warden_receiver.py:521)."""
    return F.date_format(_c(col), "yyyy-MM-dd")


def age_days(date_col: Column | str, as_of: Column) -> Column:
    """Whole days between a date(-string) column and an as-of timestamp.

    The reference computes age against utcnow()
    (reference: NERDd/modules/event_counter.py:91-92); we take an
    explicit as_of for deterministic testing (SURVEY §7 risk note).
    """
    return F.datediff(F.to_date(as_of), F.to_date(_c(date_col)))


def end_time(
    cease: Column | str, win_end: Column | str, event: Column | str, detect: Column | str
) -> Column:
    """end_time = coalesce(CeaseTime, WinEndTime, EventTime, DetectTime)
    (reference: NERDd/warden_receiver.py:524-531)."""
    return F.coalesce(
        parse_rfc_time(cease),
        parse_rfc_time(win_end),
        parse_rfc_time(event),
        parse_rfc_time(detect),
    )


def validity_filter(
    ts_col: Column | str,
    now: Column,
    max_age_days: int = 7,
    max_future_minutes: int = 5,
) -> Column:
    """P10: discard events too old or from the future
    (reference: NERDd/warden_receiver.py:444-457,510-517;
    etc/nerd.yml:26-27)."""
    c = _c(ts_col)
    return (c >= now - F.expr(f"INTERVAL {max_age_days} DAYS")) & (
        c <= now + F.expr(f"INTERVAL {max_future_minutes} MINUTES")
    )
