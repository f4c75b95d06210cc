"""Pure-Python twin of functions/urls.py — same canonical-form spec.

Used by the sequential oracle and by property tests that assert the
Column-expression implementation and this one agree on arbitrary URLs.
Mirrors Spark's ``parse_url`` (java.net.URI) behavior for the URL shapes
the crawler sees: scheme://[userinfo@]host[:port]/path[?query][#frag].
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

__all__ = ["canonicalize_url_py"]

_DEFAULT_PORTS = {"http": "80", "https": "443"}
_PORT_RE = re.compile(r":(\d+)$")
# java.net.URI getHost() hostname grammar (what Spark's try_parse_url
# accepts): dot-separated alphanumeric labels with interior hyphens,
# optional trailing dot — or a bracketed IPv6 literal. Unicode,
# underscores, empty labels, leading/trailing hyphens → NULL.
_LABEL = r"[a-z0-9](?:[a-z0-9-]*[a-z0-9])?"
_HOST_RE = re.compile(rf"^(?:{_LABEL})(?:\.(?:{_LABEL}))*\.?$")


def canonicalize_url_py(url: str | None) -> str | None:
    if url is None:
        return None
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if not scheme:
        return None
    # netloc minus userinfo, like parse_url(…,'HOST')/AUTHORITY.
    netloc = parts.netloc
    if "@" in netloc:
        netloc = netloc.rsplit("@", 1)[1]
    m = _PORT_RE.search(netloc)
    port = m.group(1) if m else ""
    host = (netloc[: m.start()] if m else netloc).lower()
    if not host:
        return None
    is_ipv6 = host.startswith("[") and host.endswith("]")
    if not is_ipv6 and not _HOST_RE.match(host):
        return None
    port_part = ""
    if port and _DEFAULT_PORTS.get(scheme) != port:
        port_part = f":{port}"
    path = parts.path or "/"
    params = [p for p in (parts.query or "").split("&") if p != ""]
    query = "&".join(sorted(params))
    query_part = f"?{query}" if query else ""
    return f"{scheme}://{host}{port_part}{path}{query_part}"
