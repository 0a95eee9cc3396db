"""The update-op merge algebra (SURVEY.md §2.4).

The reference engine's write path is a changelog of
``(etype, eid, [(op, key, params...)])`` tasks, hash-routed by entity
key so ops for one entity apply serially (reference:
NERDd/core/update_manager.py:24-65 op catalogue, :83-231 perform_update,
:420-435 hash partitioning; common/task_queue.py:58-60).

Spark rebuild, two layers:

1. ``merge_changelog`` — full-fidelity document merge. Entities are
   JSON documents; ops fold in ``seq`` order per key inside a
   cogrouped ``applyInPandas``. The shuffle on the entity key IS the
   reference's per-key serialization guarantee. This is the
   general/parity path: it supports every op including the
   non-commutative ones (set/remove/append/array_update) and the
   weak-op / !NEW / !DELETE record-lifecycle branches.

2. ``columnar merge builders`` (bottom of file) — the commutative
   subset (add, setmax, setmin, add_to_set, last-set) expressed as
   groupBy aggregations for the high-volume ingest path. These stay
   JVM-side/codegen'd; the analytics pipeline is built on them, and
   the document path exists for op-level API parity.

Scale note: the document fold ships only (key, state, ops) through one
shuffle and applies Python logic per key-group via Arrow batches.
State per key is one row; op lists are short. At 100 TB the hot path
is layer 2; layer 1 is for the entity-record upsert stream, which is
bounded by live-entity cardinality (~10^6-10^8), not event volume.
"""

from __future__ import annotations

import json
from typing import Any, Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def stable_seq(out: DataFrame) -> DataFrame:
    """Assign the changelog ``seq`` deterministically from the data.

    ``monotonically_increasing_id`` encodes the partition index, so op
    order over a union is whatever the scheduler produced that run —
    re-running (or recomputing a lost stage) can reorder ops for a key
    and merge duplicate (eid, op) rows differently (ADVICE r02). The
    fold consumes ``seq`` only *within* an eid group
    (merge_changelog sorts per key), so a per-eid row_number over the
    (op, key, params) bytes is a total, run-stable order and scales as
    a per-key sort — no global exchange.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("eid").orderBy("op", "key", "params")
    return out.withColumn("seq", F.row_number().over(w).cast("long")).select(
        "seq", "eid", "op", "key", "params"
    )


# ---------------------------------------------------------------------------
# Document-level op application (pure Python; semantics per SURVEY §2.4)
# ---------------------------------------------------------------------------

WEAK_PREFIX = "*"
EVENT_PREFIX = "!"


def _walk_parent(rec: dict, path: str, create: bool) -> tuple[dict | None, str]:
    """Resolve the parent dict of a dot path, optionally auto-creating
    intermediate dicts (reference behavior: update_manager.py:97-107)."""
    parts = path.split(".")
    cur = rec
    for p in parts[:-1]:
        nxt = cur.get(p)
        if not isinstance(nxt, dict):
            if not create:
                return None, parts[-1]
            nxt = {}
            cur[p] = nxt
        cur = nxt
    return cur, parts[-1]


def _get_path(rec: dict, path: str) -> Any:
    parent, leaf = _walk_parent(rec, path, create=False)
    if parent is None:
        return None
    return parent.get(leaf)


def _num(v: Any) -> float | int:
    return v if isinstance(v, (int, float)) and not isinstance(v, bool) else 0


def apply_op(rec: dict, op: str, key: str, params: dict) -> None:
    """Apply one op in place. ``params`` is the op's JSON param dict.

    Conventions: value ops use params['value']; next_step uses
    base/minimum/step; array ops use params['query'] (match fields)
    and params['ops'] (nested [op, key, params] triples).
    """
    if op == "set":
        parent, leaf = _walk_parent(rec, key, create=True)
        parent[leaf] = params.get("value")
    elif op == "append":
        parent, leaf = _walk_parent(rec, key, create=True)
        cur = parent.get(leaf)
        if not isinstance(cur, list):
            cur = [] if cur is None else [cur]
        cur.append(params.get("value"))
        parent[leaf] = cur
    elif op == "add_to_set":
        parent, leaf = _walk_parent(rec, key, create=True)
        cur = parent.get(leaf)
        if not isinstance(cur, list):
            cur = [] if cur is None else [cur]
        v = params.get("value")
        if v not in cur:
            cur.append(v)
        parent[leaf] = cur
    elif op == "extend_set":
        parent, leaf = _walk_parent(rec, key, create=True)
        cur = parent.get(leaf)
        if not isinstance(cur, list):
            cur = [] if cur is None else [cur]
        for v in params.get("value") or []:
            if v not in cur:
                cur.append(v)
        parent[leaf] = cur
    elif op == "rem_from_set":
        parent, leaf = _walk_parent(rec, key, create=False)
        if parent is not None and isinstance(parent.get(leaf), list):
            drop = params.get("value")
            drop = drop if isinstance(drop, list) else [drop]
            parent[leaf] = [x for x in parent[leaf] if x not in drop]
    elif op in ("add", "sub"):
        parent, leaf = _walk_parent(rec, key, create=True)
        delta = _num(params.get("value"))
        if op == "sub":
            delta = -delta
        cur = parent.get(leaf)
        parent[leaf] = delta if cur is None else _num(cur) + delta
    elif op == "setmax":
        parent, leaf = _walk_parent(rec, key, create=True)
        v = params.get("value")
        cur = parent.get(leaf)
        try:
            if cur is None or (v is not None and v > cur):
                parent[leaf] = v
        except TypeError:
            pass  # incomparable types: op is isolated as a no-op
    elif op == "setmin":
        parent, leaf = _walk_parent(rec, key, create=True)
        v = params.get("value")
        cur = parent.get(leaf)
        try:
            if cur is None or (v is not None and v < cur):
                parent[leaf] = v
        except TypeError:
            pass
    elif op == "remove":
        parent, leaf = _walk_parent(rec, key, create=False)
        if parent is not None:
            parent.pop(leaf, None)
    elif op == "next_step":
        # key = base + ((minimum - base) // step + 1) * step
        # (next aligned schedule slot strictly after `minimum`).
        # The reference reads base from the record itself via key_base
        # ("key_base MUST exist in the record",
        # update_manager.py:174-179); a literal `base` param remains as
        # the columnar-path convenience.
        parent, leaf = _walk_parent(rec, key, create=True)
        if "key_base" in params:
            base_v = _get_path(rec, params["key_base"])
            if base_v is None:
                raise KeyError(
                    f"next_step: key_base {params['key_base']!r} not in record"
                )
            base = _num(base_v)
        else:
            base = _num(params.get("base"))
        minimum = _num(params.get("minimum"))
        step = _num(params.get("step")) or 1
        parent[leaf] = base + ((minimum - base) // step + 1) * step
    elif op in ("array_update", "array_upsert"):
        parent, leaf = _walk_parent(rec, key, create=True)
        arr = parent.get(leaf)
        if not isinstance(arr, list):
            arr = []
            parent[leaf] = arr
        query: dict = params.get("query") or {}
        elem = None
        for x in arr:  # first matching element wins
            if isinstance(x, dict) and all(x.get(k) == v for k, v in query.items()):
                elem = x
                break
        if elem is None:
            if op == "array_update":
                return  # no-op when absent
            elem = dict(query)
            arr.append(elem)
        for sub_op, sub_key, sub_params in params.get("ops") or []:
            # wire format carries nested params JSON-encoded (the
            # changelog columns are typed strings, e.g. sources/intel.py)
            if isinstance(sub_params, str):
                sub_params = json.loads(sub_params)
            apply_op(elem, sub_op, sub_key, sub_params or {})
    elif op == "array_remove":
        parent, leaf = _walk_parent(rec, key, create=False)
        arr = parent.get(leaf) if parent is not None else None
        if isinstance(arr, list):
            query = params.get("query") or {}
            for i, x in enumerate(arr):
                if isinstance(x, dict) and all(
                    x.get(k) == v for k, v in query.items()
                ):
                    del arr[i]
                    break
    elif op == "event":
        pass  # control-flow marker; no data change
    else:
        raise ValueError(f"unknown op: {op}")


def fold_ops(
    record: dict | None,
    ops: Iterable[tuple[str, str, dict]],
    eid: str,
    now: Any = None,
) -> dict | None:
    """Fold an ordered op sequence into a record.

    Record-lifecycle semantics: a missing record is created unless
    every op in the batch is weak ('*'-prefixed) — weak ops never
    create (reference: update_manager.py:573-589). Creation stamps
    _id/ts_added/ts_last_update (:591-601). The '!DELETE' event drops
    the record (:640-647). Returns the new record or None (deleted /
    never created).
    """
    ops = list(ops)
    exists = record is not None
    if not exists:
        strong = [o for o in ops if not o[0].startswith(WEAK_PREFIX)]
        if not strong:
            return None
        record = {"_id": eid}
        if now is not None:
            record["ts_added"] = now
    for op, key, params in ops:
        if op.startswith(WEAK_PREFIX):
            op = op[1:]
        if op.startswith(EVENT_PREFIX):
            if op == "!DELETE":
                return None
            continue  # !NEW / !every1d / ... are handler triggers only
        apply_op(record, op, key, params or {})
    if now is not None:
        record["ts_last_update"] = now
    return record


# ---------------------------------------------------------------------------
# Distributed merge: changelog DataFrame -> entity-table delta
# ---------------------------------------------------------------------------

MERGED_SCHEMA = "eid string, record string"


def merge_changelog(
    entities: DataFrame,
    changelog: DataFrame,
    now: str | None = None,
) -> DataFrame:
    """Merge an op changelog into a JSON-document entity table.

    entities:  (eid string, record string)           — current state
    changelog: (seq long, eid string, op string,
                key string, params string)           — ops, JSON params

    Returns the new full entity table (same schema). Per-key op order =
    ``seq`` ascending.

    O(changed-keys) plan: only entities whose key appears in the
    changelog enter the Python cogroup — untouched rows pass through
    JVM-side via an anti-join and never cross the Arrow boundary. With
    a small changelog AQE turns the semi/anti joins into broadcasts,
    so the per-micro-batch cost scales with the changelog, not the
    entity-table cardinality (at 10^8 entities the previous
    full-cogroup pass re-serialized every record through Python).
    """

    def merge_group(state_pdf: pd.DataFrame, ops_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(state_pdf) > 0:
            eid = state_pdf["eid"].iloc[0]
            record = json.loads(state_pdf["record"].iloc[0])
        else:
            eid = ops_pdf["eid"].iloc[0]
            record = None
        if len(ops_pdf) > 0:
            ops_pdf = ops_pdf.sort_values("seq")
            ops = [
                (r.op, r.key, json.loads(r.params) if r.params else {})
                for r in ops_pdf.itertuples()
            ]
            record = fold_ops(record, ops, eid, now=now)
        if record is None:
            return pd.DataFrame({"eid": [], "record": []}, dtype=object)
        return pd.DataFrame({"eid": [eid], "record": [json.dumps(record, sort_keys=True)]})

    changed_keys = changelog.select("eid").distinct()
    touched = entities.join(changed_keys, "eid", "left_semi")
    untouched = entities.join(changed_keys, "eid", "left_anti")
    merged = (
        touched.groupBy("eid")
        .cogroup(changelog.groupBy("eid"))
        .applyInPandas(merge_group, MERGED_SCHEMA)
    )
    return untouched.unionByName(merged)


# ---------------------------------------------------------------------------
# Columnar fast-path: commutative op subset as aggregation builders
# ---------------------------------------------------------------------------


def agg_add(col: str, alias: str | None = None):
    """`add` op under groupBy: sum of deltas."""
    return F.sum(col).alias(alias or col)


def agg_setmax(col: str, alias: str | None = None):
    return F.max(col).alias(alias or col)


def agg_setmin(col: str, alias: str | None = None):
    return F.min(col).alias(alias or col)


def agg_add_to_set(col: str, alias: str | None = None):
    """`add_to_set`/`extend_set` under groupBy: sorted distinct collect.

    Sorted for determinism — the reference preserves insertion order,
    but its set semantics make order non-contractual.
    """
    return F.sort_array(F.array_distinct(F.collect_list(col))).alias(alias or col)


def agg_set_last(value_col: str, order_col: str, alias: str):
    """`set` (last-writer-wins) under groupBy: max_by(value, order)."""
    return F.max_by(value_col, order_col).alias(alias)


def agg_append(value_col: str, order_col: str, alias: str):
    """`append` under groupBy: order-preserving collect via sort_array
    over (order, value) structs."""
    return F.transform(
        F.sort_array(F.collect_list(F.struct(F.col(order_col).alias("o"), F.col(value_col).alias("v")))),
        lambda s: s["v"],
    ).alias(alias)


# ---------------------------------------------------------------------------
# Snapshot state: the commutative-op subset as a MERGEABLE per-entity
# table (what the reference's entity record accumulates per update
# task, NERDd/core/update_manager.py:83-231 — here the fold is a
# groupBy for the batch and a full-outer merge for state ⊕ state).
# ---------------------------------------------------------------------------

# the mergeable state columns (entity key excluded)
SNAPSHOT_STATE_COLS = (
    "total",
    "first_seen",
    "types_arr",
    "last_arrival",
    "last_value",
)


def snapshot_events(ev: DataFrame, entity: str = "user_id") -> DataFrame:
    """One aggregation pass folding an event set into §2.4 snapshot
    STATE: add (total), setmin (first_seen), add_to_set (types_arr,
    sorted), last-writer-wins set (last_value keyed by the arrival
    order (ts, event_id) — kept in the state as ``last_arrival`` so a
    later merge can re-adjudicate the writer). ``last_activity`` is
    served as last_arrival.ts — identical to max(ts) since the struct
    ordering is ts-major. Every column is associative/commutative
    state, so snapshot(A ∪ B) == merge(snapshot(A), snapshot(B))
    (:func:`merge_snapshots`, pinned by tests/test_summary_merged.py)
    — the property that lets ingest maintain the table per
    micro-batch while queries serve it aggregation-free."""
    arr = F.struct(F.col("ts").alias("ts"), F.col("event_id").alias("event_id"))
    return ev.groupBy(entity).agg(
        F.count("*").alias("total"),
        agg_setmin("ts", "first_seen"),
        agg_add_to_set("event_type", "types_arr"),
        F.max(arr).alias("last_arrival"),
        agg_set_last("value", arr, "last_value"),
    )


def merge_snapshots(
    old: DataFrame, batch: DataFrame, entity: str = "user_id"
) -> DataFrame:
    """state ⊕ state: fold a batch snapshot into an existing one with
    the same op algebra — counts add, first_seen takes the least,
    type sets union (re-sorted), the newer arrival wins last_value.
    Null-side rows (entity present in only one input) pass the other
    side through unchanged. One full-outer join on the entity key; at
    scale both sides are entity-bucketed so the exchange is pruned to
    touched buckets (sources/layout.py::update_merged_summary)."""
    o = old.select(entity, *[F.col(c).alias(f"o_{c}") for c in SNAPSHOT_STATE_COLS])
    b = batch.select(entity, *[F.col(c).alias(f"b_{c}") for c in SNAPSHOT_STATE_COLS])
    j = o.join(b, entity, "full_outer")
    batch_wins = F.col("o_last_arrival").isNull() | (
        F.col("b_last_arrival").isNotNull()
        & (F.col("b_last_arrival") >= F.col("o_last_arrival"))
    )
    empty = F.array().cast("array<string>")
    zero = F.lit(0).cast("long")
    return j.select(
        entity,
        (F.coalesce("o_total", zero) + F.coalesce("b_total", zero)).alias(
            "total"
        ),
        F.least("o_first_seen", "b_first_seen").alias("first_seen"),
        F.sort_array(
            F.array_distinct(
                F.concat(
                    F.coalesce("o_types_arr", empty),
                    F.coalesce("b_types_arr", empty),
                )
            )
        ).alias("types_arr"),
        F.greatest("o_last_arrival", "b_last_arrival").alias("last_arrival"),
        F.when(batch_wins, F.col("b_last_value"))
        .otherwise(F.col("o_last_value"))
        .alias("last_value"),
    )
