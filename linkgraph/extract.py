"""Canonical HTML text/link extraction (normative — FIXTURES.md §1.2).

The empty reference checkout makes THIS module the spec for the per-row
invariant "byte-identical extracted text per url" (BASELINE.json
``input_hint``): the synthetic pages generator (linkgraph/synth.py) writes
``text = extract_text(html)`` using the same pure function the engine's
pandas UDF applies, so the invariant is testable end-to-end.

Design constraints:
- pure functions of bytes — no external HTML parser (version drift would
  break byte-identity), no locale/wall-clock dependence;
- the Spark-facing surface is vectorized pandas UDFs only (Arrow batches;
  no per-row Python UDFs — BASELINE.json ``input_hint``).
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

_SCRIPT_RE = re.compile(rb"(?is)<script\b.*?</script>")
_STYLE_RE = re.compile(rb"(?is)<style\b.*?</style>")
_TAG_RE = re.compile(rb"(?s)<[^>]*>")
_WS_RE = re.compile(r"\s+")
# a delimiter (whitespace or quote) must precede ``href``: without it the
# lazy [^>]*? happily ends mid-attribute-name and <a data-href="..."> (or
# xlink:href) captures the WRONG attribute's value while the tag's real
# href is skipped (scanning resumes past the closing quote)
_HREF_RE = re.compile(r"(?is)<a\b[^>]*?[\s\"']href\s*=\s*\"([^\"]*)\"")


def extract_text(html: bytes) -> str:
    """Canonical HTML -> text. Deterministic single-pass tag strip.

    decode utf-8 (errors='replace') -> drop <script>/<style> subtrees ->
    strip remaining tags -> collapse whitespace runs to one space -> strip.
    """
    if html is None:
        return ""
    stripped = _TAG_RE.sub(b" ", _STYLE_RE.sub(b" ", _SCRIPT_RE.sub(b" ", html)))
    return _WS_RE.sub(" ", stripped.decode("utf-8", errors="replace")).strip()


def normalize_url(url: str) -> str | None:
    """Lowercase scheme+host, strip fragment; drop non-http(s)."""
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    host = parts.netloc.lower()
    return urlunsplit((scheme, host, parts.path, parts.query, ""))


def extract_links(html: bytes, base_url: str) -> list[str]:
    """href extraction from <a> tags: absolutize + normalize.

    Preserves document order and duplicates (dedup happens in the edge
    build, where it is tested — FIXTURES.md §1.2).
    """
    if html is None:
        return []
    text = html.decode("utf-8", errors="replace")
    out: list[str] = []
    for href in _HREF_RE.findall(text):
        try:
            absolute = urljoin(base_url or "", href.strip())
        except ValueError:
            # urljoin itself urlsplits the raw href ('http://[bad' raises
            # Invalid IPv6 URL) — one malformed href on one page must drop
            # that href, not abort the whole Arrow batch/task/job (same
            # "drop what doesn't normalize" contract as normalize_url)
            continue
        normalized = normalize_url(absolute)
        if normalized:
            out.append(normalized)
    return out


# ---------------------------------------------------------------- Spark UDFs

@F.pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Vectorized wrapper over :func:`extract_text` (Arrow batches)."""
    return html.map(extract_text)


@F.pandas_udf(ArrayType(StringType()))
def extract_links_udf(html: pd.Series, base_url: pd.Series) -> pd.Series:
    """Vectorized wrapper over :func:`extract_links` (Arrow batches)."""
    return pd.Series(
        [extract_links(h, u) for h, u in zip(html, base_url)], dtype=object
    )
