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


# --- fetchless WARC byte parsing (stdlib, no warcio) ----------------------


def iter_warc_records(data: bytes):
    """Iterate (headers: dict, payload: bytes) over raw WARC bytes —
    pure stdlib, so local fixture bytes and range-GET responses parse
    without warcio. Handles the standard framing: a CRLF header block,
    Content-Length payload bytes, then a CRLF CRLF record separator.
    Gzipped input (.warc.gz — independently-compressed members per
    record, concatenated) is handled by the caller via gzip.decompress,
    which consumes concatenated members natively.

    reference: the record walk inside extract_common_crawl.py:21-57
    (warcio ArchiveIterator), re-expressed over bytes.
    """
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record padding
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n or not data[pos : pos + 5] == b"WARC/":
            break
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            break
        headers: dict[str, str] = {}
        for line in data[pos:head_end].decode("utf-8", "replace").split("\r\n")[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            break
        body_start = head_end + 4
        yield headers, data[body_start : body_start + length]
        pos = body_start + length


def html_from_warc_bytes(data: bytes) -> str | None:
    """HTML payload of the first response record in raw or gzipped
    WARC bytes — the fetchless core of fetch_warc_html: strips the
    HTTP header block from the record payload and decodes utf-8 with
    replacement (same decode posture as the gated warcio path)."""
    if data[:2] == b"\x1f\x8b":
        import gzip

        data = gzip.decompress(data)
    for headers, payload in iter_warc_records(data):
        if headers.get("warc-type") != "response":
            continue
        http_end = payload.find(b"\r\n\r\n")
        body = payload[http_end + 4 :] if http_end >= 0 else payload
        return body.decode("utf-8", "replace")
    return None


def read_warc(spark, path: str) -> DataFrame:
    """Distributed fetchless WARC scan: binaryFile source over
    .warc/.warc.gz files, one mapInPandas stage splitting each file
    into (warc_file, url, html) rows via the stdlib record walk above.

    Scale shape: binaryFile parallelizes per file (WARC members are
    independently gzipped, but record offsets aren't known without an
    index, so a file is the natural split — Common Crawl segments are
    ~1 GB each, thousands per crawl, which keeps executors busy
    without intra-file splitting). The HTML never leaves the executor;
    downstream extraction chains extract_from_html_frame onto this.
    """
    out_schema = StructType(
        [
            StructField("warc_file", StringType(), True),
            StructField("url", StringType(), True),
            StructField("html", StringType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import gzip

        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if data[:2] == b"\x1f\x8b":
                    data = gzip.decompress(data)
                for headers, payload in iter_warc_records(data):
                    if headers.get("warc-type") != "response":
                        continue
                    http_end = payload.find(b"\r\n\r\n")
                    body = payload[http_end + 4 :] if http_end >= 0 else payload
                    rows.append(
                        (
                            fpath,
                            headers.get("warc-target-uri"),
                            body.decode("utf-8", "replace"),
                        )
                    )
            yield pd.DataFrame(rows, columns=["warc_file", "url", "html"])

    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .select("path", "content")
        .mapInPandas(run, schema=out_schema)
    )
