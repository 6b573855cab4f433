"""URL normalization kernels — the Common-Crawl-pipeline primitive that
precedes domain-level dedup/filtering/rollups (the input_hint table keys
every row by url; CC curation buckets by registered domain).

Pure deterministic functions on stdlib ``urllib.parse``; shared by the
distributed stage and the oracle expectation builder (byte-identity
discipline). The registered-domain rule is the standard two-label
heuristic with the common second-level registries (co.uk-style) taking
three labels — a deliberately spec'd subset (no live PSL list in this
container), documented and applied identically on both sides.
"""

from __future__ import annotations

from typing import Dict
from urllib.parse import urlsplit

# common second-level registry labels under 2-letter ccTLDs (co.uk,
# com.au, ac.jp, ...): a 3-label registered domain instead of 2
_SECOND_LEVEL = {"co", "com", "net", "org", "gov", "ac", "edu"}


def registered_domain(host: str) -> str:
    """eTLD+1 under the documented heuristic; the host itself when it has
    fewer labels or is an IPv4 literal."""
    labels = host.split(".")
    if len(labels) < 2 or all(p.isdigit() for p in labels):
        return host
    if (len(labels) >= 3 and len(labels[-1]) == 2
            and labels[-2] in _SECOND_LEVEL):
        return ".".join(labels[-3:])
    return ".".join(labels[-2:])


def parse_url(url: str) -> Dict:
    """url → {scheme, host, port, registered_domain, path_depth,
    has_query}. Host lowercased, port -1 when absent; ValueError on
    structurally hostless input."""
    parts = urlsplit(url)
    host = (parts.hostname or "").lower()
    if not parts.scheme or not host:
        raise ValueError(f"url without scheme/host: {url!r}")
    try:
        port = parts.port if parts.port is not None else -1
    except ValueError:
        port = -1                         # out-of-range port in the string
    depth = sum(1 for seg in parts.path.split("/") if seg)
    return {"scheme": parts.scheme.lower(), "host": host,
            "port": int(port), "registered_domain": registered_domain(host),
            "path_depth": int(depth),
            "has_query": int(bool(parts.query))}
