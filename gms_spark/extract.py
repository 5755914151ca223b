"""Reference HTML extractor + Arrow-batched Spark wrapper.

The per-row invariant (BASELINE.json input_hint): the text extracted by
the Spark path must be *byte-identical* per url to the reference
extractor. We guarantee this by construction — there is exactly ONE
implementation (:func:`extract`), used both by the single-process oracle
path in tests and by the Spark path (:func:`extract_pages`), which calls
it inside Arrow-batched ``mapInPandas`` (never a per-row Python UDF at
the Spark API level; batches cross the JVM/Python boundary as Arrow
columns).

Semantics (fixed, documented here because they ARE the spec):
  * html is utf-8 bytes (errors="replace").
  * hrefs: every ``<a ... href="...">`` double-quoted attribute, in
    document order, resolved against the page url (RFC-ish: absolute
    kept; ``//host/x`` gets the base scheme; ``/x`` gets base origin;
    otherwise joined to the base directory), deduplicated keeping first
    occurrence; fragment-only and empty hrefs dropped.
  * text: drop <script>/<style> subtrees, replace every remaining tag
    with a single space, unescape the five basic entities, then
    whitespace-normalize (``" ".join(s.split())``).

The GMS reference has no extraction stage (it ingests edge lists,
gms/third_party/gapbs/reader.h:50-57); this module is the upstream
"payload axis" required by the north rule.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from typing import NamedTuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

_HREF_RE = re.compile(r"""<a\b[^>]*?\bhref\s*=\s*"([^"]*)"[^>]*>""", re.I | re.S)
_SCRIPT_STYLE_RE = re.compile(r"<(script|style)\b.*?</\1\s*>", re.I | re.S)
_TAG_RE = re.compile(r"<[^>]*>", re.S)
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")]


class Extracted(NamedTuple):
    text: str
    hrefs: list[str]


def _origin(url: str) -> str:
    """scheme://host of a url (no trailing slash)."""
    m = re.match(r"^([a-zA-Z][a-zA-Z0-9+.-]*:)//([^/]*)", url)
    if not m:
        return url.rstrip("/")
    return m.group(1) + "//" + m.group(2)


def _base_dir(url: str) -> str:
    """Directory of a url, with trailing slash."""
    origin = _origin(url)
    path = url[len(origin):]
    if "/" not in path:
        return origin + "/"
    return origin + path[: path.rfind("/") + 1]


def resolve_href(href: str, base_url: str) -> str | None:
    """Resolve one raw href against the page url; None if not a link."""
    href = href.strip()
    if not href or href.startswith("#"):
        return None
    if re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*:", href):  # absolute (has scheme)
        return href
    scheme = base_url.split(":", 1)[0] if ":" in base_url else "https"
    if href.startswith("//"):
        return f"{scheme}:{href}"
    href = href.split("#", 1)[0]
    if not href:
        return None
    if href.startswith("/"):
        return _origin(base_url) + href
    return _base_dir(base_url) + href


def extract(html: bytes, url: str) -> Extracted:
    """THE reference extractor. Pure, deterministic, single implementation."""
    s = html.decode("utf-8", errors="replace")
    hrefs: list[str] = []
    seen: set[str] = set()
    for raw in _HREF_RE.findall(s):
        r = resolve_href(raw, url)
        if r is not None and r not in seen:
            seen.add(r)
            hrefs.append(r)
    s = _SCRIPT_STYLE_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return Extracted(" ".join(s.split()), hrefs)


EXTRACTED_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("text", StringType()),
        StructField("hrefs", ArrayType(StringType())),
    ]
)


def extract_pages(pages: DataFrame) -> DataFrame:
    """Spark path: pages(url, html, ...) -> (url, text, hrefs).

    Arrow-batched mapInPandas calling the shared :func:`extract` — the
    Spark output is byte-identical to the oracle path by construction.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ex = [extract(h, u) for h, u in zip(pdf["html"], pdf["url"])]
            yield pd.DataFrame(
                {
                    "url": pdf["url"].to_numpy(),
                    "text": [e.text for e in ex],
                    "hrefs": [e.hrefs for e in ex],
                }
            )

    return pages.select("url", "html").mapInPandas(run, EXTRACTED_SCHEMA)
