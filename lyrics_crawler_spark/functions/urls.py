"""URL composition, canonicalization and robots filtering.

The reference composes URLs by naive concatenation (P18 — SURVEY.md §2.4):
``start_url + url`` everywhere except CrawlerType1's artist page which
inserts a '/' (base_crawler.py:423). Canonicalization and robots rules are
new functionality required by the north rule; both are applied at
*enqueue* time so a disallowed URL never enters the frontier on either the
oracle or the engine side (part of the determinism contract).
"""

from __future__ import annotations

import re


def compose_url(start_url: str, url: str, topology: int, task_type: int) -> str:
    """Reference URL join. CrawlerType1 type-1 adds '/'
    (base_crawler.py:423); everything else is plain concat
    (base_crawler.py:156, :206, :231, :401, :461, :633, :657, :692, :721)."""
    if topology == 1 and task_type == 1:
        return start_url + "/" + url
    return start_url + url


_SCHEME_HOST = re.compile(r"^(https?)://([^/]+)(.*)$", re.IGNORECASE)


def canonicalize(abs_url: str) -> str:
    """Lowercase scheme+host, strip fragments, collapse duplicate slashes
    in the path, ensure a leading '/' path."""
    m = _SCHEME_HOST.match(abs_url)
    if not m:
        return abs_url
    scheme, host, rest = m.groups()
    rest = rest.split("#", 1)[0]
    rest = re.sub(r"//+", "/", rest) or "/"
    if not rest.startswith("/"):
        rest = "/" + rest
    return f"{scheme.lower()}://{host.lower()}{rest}"


def url_path(abs_url: str) -> str:
    m = _SCHEME_HOST.match(abs_url)
    return m.group(3) if m else abs_url


def robots_allowed(path: str, disallow_prefixes) -> bool:
    """Minimal robots.txt Disallow semantics: prefix match on the
    canonical path."""
    if not path.startswith("/"):
        path = "/" + path
    return not any(path.startswith(p) for p in disallow_prefixes)
