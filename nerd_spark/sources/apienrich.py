"""Per-entity API enrichment pullers: Shodan InternetDB, Passive DNS,
CIRCL BGP ranking (SURVEY §2.1 S4 family; closes the last external-API
reference modules).

The reference runs these as per-entity handlers that block on an HTTP
call inside the update pipeline (reference: NERDd/modules/shodan.py:
60-119 shodan(), NERDd/modules/passive_dns.py:92-144
passive_dns_query(), NERDd/modules/bgp_rank.py:35-83 set_bgprank()).
A Spark engine splits that differently:

- the FETCH is a driver-side snapshot loop over the triggered entity
  batch (stdlib urllib — same seam as sources/feeds.py::fetch_url, so
  every branch is loopback/file-testable offline). These APIs are
  rate-limited upstream (InternetDB returns 429; the reference sleeps
  10 s and its own retry budget is 0, shodan.py:13-14) — the
  bottleneck is the API, not the cluster, so distributing the HTTP
  calls buys nothing and multiplies the rate-limit pressure. The
  snapshot cardinality is the triggered batch, not the corpus.
- the DERIVATION is a DataFrame stage over the snapshot
  (plans/enrich.py::shodan_stage / passive_dns_stage /
  bgp_rank_stage), which is where the 100 TB side lives: broadcast /
  equi joins against the entity batch, emitting merge-algebra ops.

Each fetcher returns plain python (one dict per entity) so the
snapshot builders can assemble a typed DataFrame; HTTP status
handling mirrors the reference module branch-for-branch.
"""

from __future__ import annotations

import json
import re
import time
import urllib.error
import urllib.request

from pyspark.sql import DataFrame

# InternetDB rate-limit policy (reference: shodan.py:13-14)
RATE_LIMIT_SLEEP = 10
RATE_LIMIT_MAX_RETRIES = 0


def _api_request(
    url: str, timeout: float = 5.0, data: bytes | None = None
) -> tuple[int, bytes | None]:
    """One GET (or POST when ``data`` is given) returning
    (status_code, body). HTTP error statuses are returned, not raised
    — the callers branch on 404/429 the way the reference modules do.
    Connection-level failures propagate (the reference logs and skips
    the entity; the snapshot builders do the same)."""
    req = urllib.request.Request(url, data=data)
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:  # noqa: S310
            return resp.status, resp.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def fetch_internetdb(
    ip: str,
    base_url: str,
    timeout: float = 5.0,
    rate_limit_sleep: float = RATE_LIMIT_SLEEP,
    max_retries: int = RATE_LIMIT_MAX_RETRIES,
    _sleep=time.sleep,
) -> dict | None:
    """One InternetDB lookup (reference: shodan.py:74-119).

    Returns {"ip", "found", "ports", "tags", "cpes"}:
    - 200 -> found=True with the three arrays (missing fields -> None,
      the reference stores whatever the API returned, :108-119)
    - 404 -> found=False (drives the 'remove shodan' branch, :79-87)
    - 429 -> sleep ``rate_limit_sleep`` and retry up to
      ``max_retries`` times, then give up -> None (:88-96)
    - other statuses / connection errors -> None (no update, :97-101)
    """
    retries = 0
    while True:
        try:
            status, body = _api_request(f"{base_url}/{ip}", timeout=timeout)
        except Exception:
            return None
        if status == 404:
            return {"ip": ip, "found": False, "ports": None, "tags": None,
                    "cpes": None}
        if status == 429:
            if retries >= max_retries:
                return None
            retries += 1
            _sleep(rate_limit_sleep)
            continue
        if status != 200:
            return None
        reply = json.loads((body or b"{}").decode("utf-8"))
        return {
            "ip": ip,
            "found": True,
            "ports": reply.get("ports"),
            "tags": reply.get("tags"),
            "cpes": reply.get("cpes"),
        }


INTERNETDB_SCHEMA = (
    "ip string, found boolean, ports array<int>, tags array<string>, "
    "cpes array<string>"
)


def snapshot_internetdb(
    spark, ips: list[str], base_url: str, **kw
) -> DataFrame:
    """Snapshot the triggered IP batch against InternetDB -> typed
    DataFrame for plans/enrich.py::shodan_decisions. Entities whose
    fetch failed (rate-limit exhausted / server error) are absent —
    absent-from-snapshot means "no update", distinct from
    found=False which means "API says no data"."""
    rows = [r for r in (fetch_internetdb(ip, base_url, **kw) for ip in ips)
            if r is not None]
    return spark.createDataFrame(rows, INTERNETDB_SCHEMA) if rows else (
        spark.createDataFrame([], INTERNETDB_SCHEMA)
    )


def fetch_passive_dns(
    ip: str, base_url: str, token: str, timeout: float = 5.0, log=None
) -> list[str] | None:
    """Domains observed for ``ip`` in Passive DNS (reference:
    passive_dns.py:108-134).

    - connection error -> None, with the API token REDACTED from the
      logged URL (:114-117 — the reference is careful not to leak the
      token into logs; so are we)
    - non-200 -> None (:120-121)
    - 200 -> records with a 'domain' key and WITHOUT a 'reply' key
      ('reply' marks NXDOMAIN/NODATA negatives, :126), de-duplicated
      (records from different servers repeat, :126), trailing dot
      stripped (FQDN form, :131)."""
    url = f"{base_url}ip/{ip}?token={token}"
    try:
        status, body = _api_request(url, timeout=timeout)
    except Exception as e:
        if log is not None:
            redacted = re.sub("=.*$", "=<REDACTED>", url)
            log.error(f"Can't query '{redacted}': {e}")
        return None
    if status != 200:
        return None
    recs = json.loads((body or b"[]").decode("utf-8"))
    domains = set(
        r["domain"] for r in recs if "domain" in r and "reply" not in r
    )
    return sorted(d[:-1] if d.endswith(".") else d for d in domains)


def snapshot_passive_dns(
    spark, ips: list[str], base_url: str, token: str, **kw
) -> DataFrame:
    """(ip, domain) resolution pairs for the triggered batch —
    the passive_dns_stage probe side."""
    rows = []
    for ip in ips:
        domains = fetch_passive_dns(ip, base_url, token, **kw)
        for d in domains or []:
            rows.append((ip, d))
    schema = "ip string, domain string"
    return spark.createDataFrame(rows, schema) if rows else (
        spark.createDataFrame([], schema)
    )


def fetch_bgp_rank(asn: int, url: str, timeout: float = 5.0) -> float | None:
    """One CIRCL BGP-ranking lookup (reference: bgp_rank.py:53-83).

    POSTs the literal JSON body the reference constructs (:59) and
    reads response.ranking.rank. An unknown ASN comes back as
    rank 0.0 / position None and IS stored (the reference logs the
    miss but still emits ('set','circl_bgprank', rank), :74-83);
    connection/parse errors -> None (no update, :80-82)."""
    body = ('{"asn": ' + str(asn) + ', "address_family": "v4"}').encode()
    try:
        status, reply = _api_request(url, timeout=timeout, data=body)
        if status != 200:
            return None
        doc = json.loads((reply or b"{}").decode("utf-8"))
        return float(doc["response"]["ranking"]["rank"])
    except Exception:
        return None


def snapshot_bgp_ranks(spark, asns: list[int], url: str, **kw) -> DataFrame:
    """(asn, circl_bgprank) snapshot dim for the triggered ASN batch;
    errored lookups are absent (no update), not-found ASNs are present
    with rank 0.0 — bgp_rank_stage preserves the distinction."""
    rows = []
    for asn in asns:
        rank = fetch_bgp_rank(asn, url, **kw)
        if rank is not None:
            rows.append((int(asn), rank))
    schema = "asn long, circl_bgprank double"
    return spark.createDataFrame(rows, schema) if rows else (
        spark.createDataFrame([], schema)
    )
