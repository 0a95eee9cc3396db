"""Threat categorization (SURVEY §2.2 P11, §2.9).

The reference eval()'s per-category Python trigger expressions over
each event (reference: common/threat_categorization.py:112-195;
config etc/threat_categorization.yml:24-100). Here the triggers are
tags-DSL conditions compiled once to Column predicates — the shipped
config's trigger forms (regex on description, membership on the
category list, port/protocol comparisons) are all expressible in the
DSL's `matches` / `in` / comparison operators.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nerd_spark.plans.tags_dsl import condition_column


@dataclass
class CategoryRule:
    category: str
    condition: str  # tags-DSL over the event row
    subcategory_attr: str | None = None  # the '->' extraction


def categorize(events: DataFrame, rules: list[CategoryRule]) -> DataFrame:
    """One output row per (event, matched category): id columns +
    (category, subcategory). An event matching no rule emits nothing —
    same as the reference's trigger loop."""
    matches = F.array_compact(
        F.array(
            *[
                F.when(
                    condition_column(r.condition, events),
                    F.struct(
                        F.lit(r.category).alias("category"),
                        (
                            F.col(r.subcategory_attr).cast("string")
                            if r.subcategory_attr
                            else F.lit(None).cast("string")
                        ).alias("subcategory"),
                    ),
                )
                for r in rules
            ]
        )
    )
    return (
        events.withColumn("_cat", F.explode(matches))
        .withColumn("category", F.col("_cat.category"))
        .withColumn("subcategory", F.col("_cat.subcategory"))
        .drop("_cat")
    )
