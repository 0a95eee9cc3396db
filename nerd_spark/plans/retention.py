"""TTL / retention passes (SURVEY §2.8).

The reference keeps per-source TTL tokens `_ttl.<src>` on each record
and a daily pass drops expired tokens, deleting the record when none
remain; '*' marks immortal records (reference:
NERDd/modules/cleaner.py:204-241; tokens set at
warden_receiver.py:541,561, blacklists.py:171 etc.; config
etc/nerd.yml:5-20). History pruning caps the per-day buckets at
max_event_history days (cleaner.py:64-202; etc/nerd.yml:24).

Spark shape: both are declarative filters in a daily compaction job —
on a date-partitioned fact table the history prune is partition
pruning, not row work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

IMMORTAL = "*"  # sentinel TTL token key


def drop_expired_tokens(entities: DataFrame, now: Column, ttl_col="_ttl") -> DataFrame:
    """Remove expired tokens from the TTL map (cleaner.py:216-229)."""
    return entities.withColumn(
        ttl_col,
        F.map_filter(
            F.col(ttl_col), lambda k, v: (k == IMMORTAL) | (v >= now)
        ),
    )


def live_predicate(now: Column, ttl_col="_ttl") -> Column:
    """Record survives while any token is live or it is immortal
    (cleaner.py:230-241)."""
    ttl = F.col(ttl_col)
    return (
        ttl.isNotNull()
        & (
            F.map_contains_key(ttl, F.lit(IMMORTAL))
            | (F.array_max(F.map_values(ttl)) >= now)
        )
    )


def expire_entities(entities: DataFrame, now: Column, ttl_col="_ttl") -> DataFrame:
    """The daily expiry pass: drop dead tokens, delete dead records."""
    return drop_expired_tokens(entities, now, ttl_col).filter(
        live_predicate(now, ttl_col)
    )


def prune_history(daily_facts: DataFrame, now: Column, max_age_days: int = 90) -> DataFrame:
    """Drop per-day rows older than the metadata horizon. On the
    date-partitioned fact table this predicate is partition-pruned."""
    return daily_facts.filter(
        F.datediff(F.to_date(now), F.col("d")) <= max_age_days
    )
