"""WebDataset INTEROP check (round-10 verdict Next #8): our tar shards
must be consumable under the PUBLIC webdataset convention, not just by
our own reader.

The vendored iterator below replicates the public webdataset reader's
member-pairing rule (``webdataset.tariterators.group_by_keys``): the
sample key is the member basename up to the FIRST dot, the extension
is everything after it, and CONSECUTIVE members sharing a key form one
sample (no global grouping). Pure stdlib, no network dependency.

Documented divergence: our own read_webdataset splits member names at
the LAST dot (key may contain dots, extension may not). The two rules
agree exactly when keys are dot-free — the writer's stringified-id key
discipline. A dotted key pairs DIFFERENTLY under the public rule; the
divergence test below pins that behavior so it stays a documented
contract, not a surprise.
"""

from __future__ import annotations

import io
import os
import tarfile
from collections.abc import Iterator

from pyspark.sql import functions as F

from firmable_aus_etl_spark.sources.webdataset import (
    read_webdataset,
    write_webdataset,
)

MEMBERS = {"text": "txt", "meta": "json"}


def public_rule_samples(shard_path: str) -> Iterator[dict]:
    """Vendored minimal public-webdataset iterator: FIRST-dot key
    split, consecutive-member grouping."""
    sample: dict = {}
    with tarfile.open(shard_path) as tar:
        for info in tar:
            if not info.isfile() or "." not in info.name:
                continue
            key, ext = info.name.split(".", 1)
            if sample.get("__key__") not in (None, key):
                yield sample
                sample = {}
            sample["__key__"] = key
            sample[ext] = tar.extractfile(info).read()
    if sample:
        yield sample


def test_public_rule_loader_matches_engine_reader(spark, tmp_path):
    """One committed shard set, read by BOTH consumers: identical
    sample keys, identical member bytes."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    staged = docs.select(
        "doc_id",
        "text",
        F.to_json(F.struct("lang", "source")).alias("meta"),
    )
    out = str(tmp_path / "wds")
    names = write_webdataset(
        staged, out, key_col="doc_id", members=MEMBERS, n_shards=3
    )

    engine = {
        r["key"]: (bytes(r["text"]), bytes(r["meta"]))
        for r in read_webdataset(spark, out, members=MEMBERS).collect()
    }
    public = {}
    for n in names:
        for s in public_rule_samples(os.path.join(out, n)):
            assert set(s) <= {"__key__", "txt", "json"}, s.keys()
            public[s["__key__"]] = (s["txt"], s["json"])
    assert engine == public
    assert len(engine) == docs.count()


def test_member_adjacency_is_loader_safe(spark, tmp_path):
    """The public rule groups CONSECUTIVE members only — a sample whose
    members were scattered across the tar would silently split. Assert
    every sample's members are adjacent in raw tar order (the writer's
    documented loader contract)."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(40)
    staged = docs.select(
        "doc_id", "text", F.to_json(F.struct("lang")).alias("meta")
    )
    out = str(tmp_path / "wds_adj")
    names = write_webdataset(
        staged, out, key_col="doc_id", members=MEMBERS, n_shards=2
    )
    for n in names:
        with tarfile.open(os.path.join(out, n)) as tar:
            keys = [
                m.name.split(".", 1)[0] for m in tar if m.isfile()
            ]
        seen: set[str] = set()
        prev = None
        for k in keys:
            if k != prev:
                assert k not in seen, f"non-adjacent members for key {k}"
                seen.add(k)
            prev = k


def test_dotted_key_divergence_is_pinned(tmp_path):
    """A key containing a dot pairs differently: our reader keeps the
    full key (last-dot split); the public rule truncates at the first
    dot and may MERGE adjacent samples. Pin the divergence so the
    dot-free-key discipline stays load-bearing."""
    shard = tmp_path / "shard-00000.tar"
    with tarfile.open(shard, "w", format=tarfile.USTAR_FORMAT) as tar:
        for name, data in [
            ("doc.1.txt", b"one"),
            ("doc.2.txt", b"two"),
        ]:
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
    got = list(public_rule_samples(str(shard)))
    # public rule: both members collapse into ONE sample keyed 'doc'
    # (extensions '1.txt' / '2.txt') — NOT two samples
    assert len(got) == 1 and got[0]["__key__"] == "doc"
    assert got[0]["1.txt"] == b"one" and got[0]["2.txt"] == b"two"
