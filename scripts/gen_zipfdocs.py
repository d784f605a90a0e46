"""Zipf/boilerplate documents fixture for the df-prune scaling fit
(round-7 verdict #3).

The base synthetic corpus (gen_scaledata.py) mirrors the driver
fixture's UNIFORM 30-word vocab — there every shingle's df grows
proportionally with n (df ~ n/27k), which means (a) any EXACT
set-similarity join is inherently quadratic there (Sum_sh C(df,2) with
df ∝ n), and (b) df-pruning cannot help without destroying recall,
because the mid-df shingles ARE the content. Real corpora are not like
that: content shingles have df = O(1) and boilerplate df ∝ n. This
generator produces that shape, so the auto_prune_df rule (max(8,
isqrt(n))) has a real boilerplate regime to separate:

- word ids are Zipf(a=1.6) over an unbounded vocabulary ("w<k>") —
  the shingle space GROWS with the corpus, so content-shingle df
  stays O(1) while the Zipf head supplies realistic mid-frequency
  templating;
- 30% of docs carry a fixed 12-word boilerplate header (df = 0.3 n —
  the df ∝ n regime the rule prunes);
- 5% near-dup mutated copies + ~0.16% exact dups, same rates as the
  base generator (these are the recall payload: their similarity
  lives in content shingles).

Writes ONLY documents.parquet (the prune fit reads nothing else).
Deterministic per (sf, seed). Usage:

    python scripts/gen_zipfdocs.py SF [outdir]
    (outdir defaults to /tmp/zipfdocs/sf{SF}; n_docs = 50_000 * SF)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 4242
BOILER = (
    "this document is provided as is without warranty of any kind "
    "see terms"
)
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.42, 0.145, 0.145, 0.145, 0.145]


def gen(sf: float, outdir: str) -> None:
    n = int(50_000 * sf)
    rng = np.random.default_rng(SEED)
    n_words = rng.integers(10, 105, size=n)
    texts: list[str] = []
    for i in range(n):
        r = rng.random()
        if i > 10 and r < 0.0016:
            texts.append(texts[rng.integers(0, i)])
            continue
        if i > 10 and r < 0.05 + 0.0016:
            w = texts[rng.integers(0, i)].split(" ")
            for _ in range(2):
                w[rng.integers(0, len(w))] = "dup"
            texts.append(" ".join(w))
            continue
        ids = rng.zipf(1.6, size=int(n_words[i]))
        body = " ".join(f"w{k}" for k in ids)
        if rng.random() < 0.30:
            body = f"{BOILER} {body}"
        texts.append(body)
    langs = rng.choice(LANGS, size=n, p=LANG_P)
    table = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(langs.tolist()),
        "source": pa.array([f"src{int(x)}" for x in rng.integers(0, 20, size=n)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    os.makedirs(outdir, exist_ok=True)
    pq.write_table(table, os.path.join(outdir, "documents.parquet"))
    print(f"wrote {n} docs -> {outdir}/documents.parquet")


if __name__ == "__main__":
    sf = float(sys.argv[1])
    outdir = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/zipfdocs/sf{sf}"
    gen(sf, outdir)
