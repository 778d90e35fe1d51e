"""URL canonicalization (SURT keys) — the crawl-curation staple.

Canonical form follows the public SURT convention (Sort-friendly URI
Reordering Transform, as used by Heritrix / Common Crawl indexes):
scheme dropped, userinfo dropped, host lowercased and dot-reversed with
commas, default ports stripped, fragment dropped, query params sorted.
``com,example)/path?a=1&b=2`` sorts hosts hierarchically so one hash
partition holds one site's pages — the natural partitioning key for
per-site dedup/quota stages downstream.

Every rule here is mirrored expression-for-expression in
:func:`surt_sql` so the DuckDB oracle twin hash-matches; a pytest drives
both sides over adversarial URLs via an inline VALUES table.
"""

from __future__ import annotations

import re

_URL_RE = re.compile(
    r"^(?:([A-Za-z][A-Za-z0-9+.\-]*)://)?([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$"
)
_DEFAULT_PORTS = {"http": ":80", "https": ":443"}


def canonicalize(url: str) -> tuple[str, str]:
    """-> (host, surt). Unparseable inputs -> ('', '')."""
    m = _URL_RE.match(url)
    if not m:
        return "", ""
    scheme = (m.group(1) or "").lower()
    netloc = m.group(2) or ""
    path = m.group(3) or ""
    query = m.group(4) or ""
    host = netloc.rsplit("@", 1)[-1].lower()
    dflt = _DEFAULT_PORTS.get(scheme)
    if dflt and host.endswith(dflt):
        host = host[: -len(dflt)]
    rev = ",".join(host.split(".")[::-1]) if host else ""
    q = "&".join(sorted(p for p in query.split("&") if p))
    surt = rev + ")" + path + ("?" + q if q else "")
    return host, surt


def surt_host_sql(url: str) -> str:
    """DuckDB expression: the canonical (lowercased, userinfo- and
    default-port-stripped) host of ``url``."""
    netloc = f"regexp_extract(regexp_replace({url}, '^[A-Za-z][A-Za-z0-9+.-]*://', ''), '^([^/?#]*)', 1)"
    host = f"lower(regexp_replace({netloc}, '^.*@', ''))"
    scheme = f"lower(regexp_extract({url}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    return (
        f"CASE WHEN {scheme} = 'http' AND {host} LIKE '%:80' "
        f"THEN left({host}, length({host}) - 3) "
        f"WHEN {scheme} = 'https' AND {host} LIKE '%:443' "
        f"THEN left({host}, length({host}) - 4) "
        f"ELSE {host} END"
    )


def surt_sql(url: str, host: str) -> str:
    """DuckDB expression: the full SURT key given the ``url`` column and a
    ``host`` expression (from :func:`surt_host_sql`)."""
    # strip the fragment BEFORE extracting the query: a '?' inside the
    # fragment (http://h/p#f?a=1) is not a query start — canonicalize()
    # drops the fragment first, so the twin must too
    rest = (f"regexp_replace(regexp_replace({url},"
            f" '^[A-Za-z][A-Za-z0-9+.-]*://', ''), '#.*$', '')")
    path = f"regexp_extract({rest}, '^[^/?#]*([^?#]*)', 1)"
    query = f"regexp_extract({rest}, '\\?([^#]*)', 1)"
    sorted_q = (
        f"array_to_string(list_sort(list_filter(string_split({query}, '&'),"
        f" x -> x <> '')), '&')"
    )
    rev = (
        f"CASE WHEN {host} = '' THEN '' ELSE "
        f"array_to_string(list_reverse(string_split({host}, '.')), ',') END"
    )
    return (
        f"{rev} || ')' || {path} || "
        f"CASE WHEN {sorted_q} <> '' THEN '?' || {sorted_q} ELSE '' END"
    )
