"""WARC HTML field-extraction source (SURVEY.md warc-source, u6).

The reference range-GETs WARC records and extracts a company name via
a 6-level fallback chain — og:site_name -> JSON-LD -> microdata -> CSS
class -> <title> split -> <h1> — plus industry from meta keywords
(reference: extract_common_crawl.py:45-120).

Spark-first re-expression:
- the byte-range fetch is per-row work over an input table of
  (filename, offset, length): a mapInPandas stage (gated on
  warcio/requests; stubbed deterministically in this container);
- the HTML field extraction is a PURE Python function on the html
  string (regex-based — no bs4 dependency), unit-tested on embedded
  literals, applied distributed via an Arrow-batched iterator UDF.

The fallback chain itself mirrors f10 coalesce semantics: first
non-null extractor wins.
"""

from __future__ import annotations

import json
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

HTML_FIELDS_SCHEMA = StructType(
    [
        StructField("company_name", StringType(), True),
        StructField("industry", StringType(), True),
    ]
)

_RE_OG_SITE = re.compile(
    r'<meta[^>]+property=["\']og:site_name["\'][^>]+content=["\']([^"\']+)["\']', re.I
)
_RE_OG_SITE_REV = re.compile(
    r'<meta[^>]+content=["\']([^"\']+)["\'][^>]+property=["\']og:site_name["\']', re.I
)
_RE_JSONLD = re.compile(
    r'<script[^>]+type=["\']application/ld\+json["\'][^>]*>(.*?)</script>', re.I | re.S
)
_RE_ITEMPROP_NAME = re.compile(
    r'<[^>]+itemprop=["\']name["\'][^>]*>([^<]+)<', re.I
)
_RE_CLASS_NAME = re.compile(
    r'<[^>]+class=["\'][^"\']*(?:company-name|site-title|brand)[^"\']*["\'][^>]*>([^<]+)<',
    re.I,
)
_RE_TITLE = re.compile(r"<title[^>]*>([^<]+)</title>", re.I)
_RE_H1 = re.compile(r"<h1[^>]*>([^<]+)</h1>", re.I)
_RE_META_KEYWORDS = re.compile(
    r'<meta[^>]+name=["\']keywords["\'][^>]+content=["\']([^"\']+)["\']', re.I
)


def _jsonld_org_name(html: str) -> str | None:
    for blob in _RE_JSONLD.findall(html):
        try:
            data = json.loads(blob.strip())
        except Exception:
            continue
        items = data if isinstance(data, list) else [data]
        for item in items:
            if isinstance(item, dict) and item.get("@type") in ("Organization", "Corporation", "LocalBusiness"):
                name = item.get("name")
                if name:
                    return str(name)
    return None


def _title_last_segment(html: str) -> str | None:
    m = _RE_TITLE.search(html)
    if not m:
        return None
    # company usually sits after the last separator: "Products - Acme"
    parts = re.split(r"[-|–—]", m.group(1))
    last = parts[-1].strip()
    return last or None


def extract_company_fields(html: str | None) -> tuple[str | None, str | None]:
    """Pure fallback-chain extraction: (company_name, industry).

    Order mirrors the reference's precedence (extract_common_crawl.py:
    59-120): og:site_name, JSON-LD org, microdata itemprop=name,
    branded CSS class, <title> tail, <h1>.
    """
    if not html:
        return None, None
    def _og_site(h: str) -> str | None:
        m = _RE_OG_SITE.search(h) or _RE_OG_SITE_REV.search(h)
        return m.group(1).strip() if m else None

    name = None
    for fn in (
        _og_site,
        _jsonld_org_name,
        lambda h: (m.group(1).strip() if (m := _RE_ITEMPROP_NAME.search(h)) else None),
        lambda h: (m.group(1).strip() if (m := _RE_CLASS_NAME.search(h)) else None),
        _title_last_segment,
        lambda h: (m.group(1).strip() if (m := _RE_H1.search(h)) else None),
    ):
        name = fn(html)
        if name:
            break
    industry = None
    if (m := _RE_META_KEYWORDS.search(html)) is not None:
        industry = m.group(1).split(",")[0].strip() or None
    return name, industry


def fetch_warc_html(filename: str, offset: int, length: int) -> str | None:
    """Range-GET one WARC record and return its HTML payload.

    Gated on warcio + requests (absent in this container) — raises
    NotImplementedError so callers stub it in tests; the Spark-side
    plumbing below is real either way.
    """
    try:  # pragma: no cover - network path
        import io

        import requests
        from warcio.archiveiterator import ArchiveIterator
    except ImportError as exc:
        raise NotImplementedError("warcio/requests not available in this environment") from exc
    headers = {"Range": f"bytes={offset}-{offset + length - 1}"}  # pragma: no cover
    resp = requests.get(
        f"https://data.commoncrawl.org/{filename}", headers=headers, timeout=60
    )  # pragma: no cover
    for record in ArchiveIterator(io.BytesIO(resp.content)):  # pragma: no cover
        if record.rec_type == "response":
            return record.content_stream().read().decode("utf-8", "replace")
    return None  # pragma: no cover


def extract_from_html_frame(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Distributed HTML field extraction over a DataFrame holding raw
    HTML (already fetched or test-injected).

    mapInPandas keeps the regex work Arrow-batched; output appends
    (company_name, industry) to the input columns.
    """
    out_schema = StructType(list(df.schema.fields) + list(HTML_FIELDS_SCHEMA.fields))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            extracted = [extract_company_fields(h) for h in pdf[html_col]]
            pdf = pdf.copy()
            pdf["company_name"] = [e[0] for e in extracted]
            pdf["industry"] = [e[1] for e in extracted]
            yield pdf

    return df.mapInPandas(run, schema=out_schema)
