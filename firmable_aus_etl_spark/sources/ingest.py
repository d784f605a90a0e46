"""Driver-side archive ingest (SURVEY §2.1 http-zip-source).

reference: ETL_PIPELINE_AUS/scripts/extraction/extract_abr_xml.py:17-38
— download a ZIP from data.gov.au, extract its XML members, and skip
work that is already done (the reference checks output-file existence
for idempotent Airflow re-runs, dags/etl_pipeline.py:42-49).

The network fetch stays gated (this container has no network); the
archive-extraction half is pure stdlib and fully testable. At scale
this runs once on the driver (or an init job) to land raw files where
the DISTRIBUTED readers — spark.read.format('xml') / binaryFile —
take over; archive unpacking is inherently sequential per file and
does not belong inside an executor map.
"""

from __future__ import annotations

import os
import zipfile
from collections.abc import Sequence


def list_members(zip_path: str, *, suffix: str = ".xml") -> list[str]:
    """Member names with the given suffix, sorted for determinism."""
    with zipfile.ZipFile(zip_path) as zf:
        return sorted(n for n in zf.namelist() if n.lower().endswith(suffix))


def unzip_members(
    zip_path: str,
    dest_dir: str,
    *,
    suffix: str = ".xml",
    skip_existing: bool = True,
) -> list[str]:
    """Extract matching members into ``dest_dir``; returns the paths
    actually written. ``skip_existing=True`` reproduces the
    reference's idempotence rule: a member whose output file already
    exists is not re-extracted, so re-runs are cheap and safe."""
    os.makedirs(dest_dir, exist_ok=True)
    written: list[str] = []
    with zipfile.ZipFile(zip_path) as zf:
        for name in list_members(zip_path, suffix=suffix):
            # flatten archive paths; never let a member escape dest_dir
            out = os.path.join(dest_dir, os.path.basename(name))
            if skip_existing and os.path.exists(out):
                continue
            with zf.open(name) as src, open(out, "wb") as dst:
                dst.write(src.read())
            written.append(out)
    return written


def fetch_zip(url: str, dest_path: str, *, timeout: int = 60) -> str:
    """Gated HTTP download (reference: extract_abr_xml.py:17-27).

    Raises RuntimeError unless ``requests`` is importable AND the
    caller's environment provides network access; tests exercise
    list/unzip on locally built archives instead.
    """
    try:
        import requests  # type: ignore
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise RuntimeError(
            "zip fetch requires the optional 'requests' dependency "
            "(pip install firmable-aus-etl-spark[extract])"
        ) from e
    resp = requests.get(url, timeout=timeout)  # pragma: no cover
    resp.raise_for_status()  # pragma: no cover
    with open(dest_path, "wb") as f:  # pragma: no cover
        f.write(resp.content)
    return dest_path  # pragma: no cover
