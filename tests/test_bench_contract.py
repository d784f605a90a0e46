"""Driver-contract test for bench.py's final stdout line.

The round-2 bench artifact failed to parse because the single JSON line
(~3.5 KB with all_runs) overflowed the driver's ~2000-byte tail capture.
The contract is now: the LAST line is a compact summary < 1800 bytes;
everything else goes to BENCH_LOCAL_latest.json. This test rebuilds the
compact payload with the real headline names and worst-case-width
values, so adding a query to HEADLINE that would overflow the buffer
fails here, not in the driver.
"""

from __future__ import annotations

import json

import bench


def test_compact_line_fits_driver_tail_buffer():
    # worst-case widths: 5-digit seconds with 3 decimals per query,
    # worst-case sentinel widths
    timings = {name: 99999.999 for name in bench.HEADLINE}
    compact = {
        "metric": "headline_queries_total",
        "value": 99999.999,
        "unit": "sec",
        "queries": timings,
        "sf": 0.1,
        "sentinel": [99.9999, 99.9999, 0.1, 999.999],
    }
    line = json.dumps(compact, separators=(",", ":"))
    assert len(line.encode()) < 1800, (
        f"compact bench line would be {len(line.encode())} bytes; "
        "driver tail capture holds ~2000 — trim HEADLINE or shorten keys"
    )


def test_headline_names_resolve():
    missing = [n for n in bench.HEADLINE if n not in bench.ALL_QUERIES]
    assert missing == [], f"HEADLINE references unregistered queries: {missing}"


def test_sentinel_returns_positive_seconds():
    t = bench._sentinel()
    assert 0.0 < t < 10.0
