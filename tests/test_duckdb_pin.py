"""Pin for the DuckDB oracle workaround in queries/recordq.py.

The ip_records oracle splits `count(DISTINCT ..) FILTER` and
`list(struct_pack(..))` into separate CTEs because combining them in
ONE aggregate trips an InternalException (shared_ptr NULL) in the
DuckDB shipped here (1.0.0). The split is value-neutral, but this
test pins the assumption so an engine upgrade can't silently change
the oracle's shape:

- on an affected engine, the combined form must still raise — proving
  the workaround is still required;
- on a fixed engine, the combined form must produce exactly the
  values the split form produces — proving the workaround is (now
  redundant but) value-preserving, so the oracle hash is unchanged.
"""

from __future__ import annotations

import duckdb

_SETUP = """
CREATE TABLE daily AS
SELECT i % 3 AS id,
       'n' || (i % 5)::VARCHAR AS node,
       'c' || (i % 2)::VARCHAR AS cat,
       i AS n,
       (DATE '2024-01-01' + INTERVAL (i % 9) DAY)::VARCHAR AS date
FROM range(40) t(i)
"""

# the shape recordq.py would use if it didn't split (distinct-filter
# aggregate and list(struct) in the same GROUP BY)
_COMBINED = """
SELECT id,
  count(DISTINCT node) FILTER (WHERE n > 5) AS dn,
  array_to_string(list_sort(list(
    struct_pack(date := date, node := node, cat := cat, n := n)
  )), '|') AS evs
FROM daily GROUP BY 1 ORDER BY 1
"""

# the workaround actually shipped: one CTE per aggregate family,
# joined back on the key (recordq.py `rec` vs `evs` CTEs)
_SPLIT = """
WITH rec AS (
  SELECT id, count(DISTINCT node) FILTER (WHERE n > 5) AS dn
  FROM daily GROUP BY 1
),
evs AS (
  SELECT id, array_to_string(list_sort(list(
    struct_pack(date := date, node := node, cat := cat, n := n)
  )), '|') AS evs
  FROM daily GROUP BY 1
)
SELECT rec.id, dn, evs FROM rec JOIN evs USING (id) ORDER BY 1
"""


def test_split_aggregate_workaround_pinned():
    con = duckdb.connect()
    con.execute(_SETUP)
    split = con.execute(_SPLIT).fetchall()
    assert len(split) == 3  # the split form must always work
    try:
        combined = con.execute(_COMBINED).fetchall()
    except duckdb.InternalException:
        # engine still affected (duckdb 1.0.0): workaround required.
        # Nothing more to check — the split form is the only runnable
        # formulation, so it IS the oracle semantics.
        return
    # engine fixed: the workaround must be value-preserving or the
    # oracle hash would silently change on upgrade
    assert combined == split, (
        f"duckdb {duckdb.__version__} fixed the combined aggregate but "
        "it disagrees with the split workaround in queries/recordq.py — "
        "re-derive the oracle before trusting hashes"
    )
