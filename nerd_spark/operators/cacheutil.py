"""Cache-lifetime control for operators that persist into a returned plan.

Several operators persist an intermediate frame that is consumed both
by an eager probe (a count/first that routes the plan) and by the
lazily-returned result — so an eager ``unpersist`` before returning
would force a recompute when the caller finally materializes. Earlier
rounds documented these pins as "ContextCleaner reclaims on plan GC",
which is TRUE for RDD persists (``SparkContext.persistentRdds`` holds
weak references) but FALSE for DataFrame persists: the SQL
``CacheManager`` keeps a strong reference to every cached logical
plan until an explicit ``unpersist``, so in a long-lived session
(a notebook, a streaming driver, the bench loop) these entries
accumulate without bound — measured: dropping every Python reference
and forcing GC on both sides leaves the storage entry in place.

:func:`tie_unpersist` makes the documented lifetime contract actually
hold: it registers a ``weakref.finalize`` on the RESULT DataFrame's
Python handle that unpersists the pinned inputs when the handle is
garbage-collected — i.e. the cache lives exactly as long as the
caller can still materialize the plan cheaply, and a driver loop that
builds/collects/drops query results releases executor storage as it
goes.

Two deliberate edges:

- **Tie transfer.** When an operator derives its final result from
  another tied frame (``top_frequent`` round 2 wraps
  ``heavy_hitters``'s output), the intermediate handle dies inside
  the outer call. Passing it to ``tie_unpersist`` DETACHES its
  finalizer and moves ownership to the new result, so the inner pin
  survives until the OUTER result is dropped.
- **Derive-and-drop recomputes.** A caller that derives a child frame
  and drops the tied handle before acting loses the cache (the child
  plan still computes correctly, just without the pin). That is the
  intended trade: correctness never depends on the cache, and the
  registry/driver pattern — build, collect, drop — is the lifetime
  the tie models.

Finalizers are registered with ``atexit = False``: at interpreter
exit the JVM is going down anyway and a blocking unpersist storm
would only slow shutdown.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame

_TIE_ATTR = "_nerd_cache_tie"


def _release(jdfs) -> None:
    for j in jdfs:
        try:
            j.unpersist(False)
        except Exception:
            # session already stopped / JVM gone — nothing to free
            pass


def tie_unpersist(result: DataFrame, *pinned: DataFrame) -> DataFrame:
    """Unpersist ``pinned`` frames when ``result``'s handle is GC'd.

    For each frame in ``pinned``: if it carries a tie from a nested
    ``tie_unpersist`` call, ownership transfers to ``result`` (the
    nested finalizer is detached, never fired); if it is itself
    cached, its cache entry joins the tie. Frames that are neither
    are ignored, so call sites can pass whatever variable currently
    holds the plan without tracking which path persisted it.

    Returns ``result`` for expression-style use at return sites.
    """
    jdfs = []
    for frame in pinned:
        fin = getattr(frame, _TIE_ATTR, None)
        if fin is not None and fin.alive:
            detached = fin.detach()
            if detached is not None:
                jdfs.extend(detached[2][0])
        if getattr(frame, "is_cached", False):
            jdf = frame._jdf
            if all(j is not jdf for j in jdfs):
                jdfs.append(jdf)
    if jdfs:
        fin = weakref.finalize(result, _release, jdfs)
        fin.atexit = False
        setattr(result, _TIE_ATTR, fin)
    return result


def tie_unpersist_shared(results, *pinned):
    """Like :func:`tie_unpersist` for operators that return SEVERAL
    frames over one cached input (``split_corrupt``'s ok/corrupt pair):
    the pin releases only after EVERY returned handle is GC'd, so
    dropping one early never forces the survivor to recompute. Shared
    ties are not transferable (no ``_nerd_cache_tie`` attribute) —
    wrap the individual results with :func:`tie_unpersist` if transfer
    is needed."""
    jdfs = [f._jdf for f in pinned if getattr(f, "is_cached", False)]
    if not jdfs:
        return results
    state = {"n": len(results)}

    def _dec():
        state["n"] -= 1
        if state["n"] == 0:
            _release(jdfs)

    for r in results:
        fin = weakref.finalize(r, _dec)
        fin.atexit = False
    return results
