"""Math primitives for the reputation/EWMA pipeline (SURVEY §2.5).

All pure column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def nonlin(v: Column | str, scale: float = 1.0, base: float = 0.5) -> Column:
    """Saturating nonlinearity nonlin(v) = min(1 - base^(v/scale), 1).

    Mirrors the reputation scoring transform
    (reference: NERDd/modules/reputation.py:16-21 and
    common/threat_categorization summary variant
    threat_category_summary.py:16-21). NULL input -> 0 contribution.
    """
    c = F.coalesce(_c(v).cast("double"), F.lit(0.0))
    raw = F.lit(1.0) - F.pow(F.lit(float(base)), c / F.lit(float(scale)))
    return F.least(raw, F.lit(1.0))


def ewma_weights(n: int = 7, alpha: float = 0.25, decay: float = 0.75) -> list[float]:
    """Weights alpha * decay^i for i in 0..n-1 (most recent day first).

    (reference: NERDd/modules/event_counter.py:12-13 — [0.25 * 0.75^i]).
    """
    return [alpha * decay**i for i in range(n)]


def ewma_expr(counts_by_age: list[Column], binary: bool = False) -> Column:
    """EWMA over per-day counts indexed by age (0 = today).

    counts_by_age[i] is the count for age i; missing days must be
    passed as lit(0). binary=True computes the bin_ewma variant
    (weight counted when count > 0; reference:
    NERDd/modules/event_counter.py:104-115).
    """
    ws = ewma_weights(len(counts_by_age))
    terms = []
    for w, c in zip(ws, counts_by_age):
        c = F.coalesce(c.cast("double"), F.lit(0.0))
        if binary:
            terms.append(F.when(c > 0, F.lit(w)).otherwise(F.lit(0.0)))
        else:
            terms.append(c * F.lit(w))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def prob_or(parts: list[Column]) -> Column:
    """Combine per-source reputations: 1 - prod(1 - r_i).

    (reference: NERDd/modules/reputation.py:100-109 total rep =
    1 - prod(1 - rep_src * trust_src)). Expressed as a fold so it
    stays a single codegen'd expression; NULL parts count as 0.
    """
    acc = F.lit(1.0)
    for p in parts:
        acc = acc * (F.lit(1.0) - F.coalesce(p.cast("double"), F.lit(0.0)))
    return F.lit(1.0) - acc
