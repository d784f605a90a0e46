"""WebDataset tar-shard sink/source (sources/webdataset.py):
byte-determinism, round-trip equality, shard assignment, sparse
members, loader-contract member adjacency."""

from __future__ import annotations

import hashlib
import io
import tarfile

from pyspark.sql import functions as F

from firmable_aus_etl_spark.sources.webdataset import (
    read_webdataset,
    write_webdataset,
)

MEMBERS = {"text": "txt", "payload": "bin"}


def _docs(spark, n=40):
    rows = [
        (f"doc{i:04d}", f"body of {i}", bytes([i % 251, (i * 7) % 251]))
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "doc_id string, text string, payload binary"
    )


def _tar_bytes(path):
    out = {}
    import glob
    import os

    for p in sorted(glob.glob(os.path.join(path, "*.tar"))):
        out[os.path.basename(p)] = open(p, "rb").read()
    return out


def test_write_is_byte_deterministic(spark, tmp_path):
    df = _docs(spark)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    names_a = write_webdataset(
        df.repartition(7), a, key_col="doc_id", members=MEMBERS, n_shards=4
    )
    names_b = write_webdataset(
        df.repartition(3), b, key_col="doc_id", members=MEMBERS, n_shards=4
    )
    assert names_a == names_b
    ta, tb = _tar_bytes(a), _tar_bytes(b)
    assert ta.keys() == tb.keys()
    for name in ta:
        assert hashlib.md5(ta[name]).hexdigest() == hashlib.md5(
            tb[name]
        ).hexdigest(), name


def test_round_trip_recovers_all_samples(spark, tmp_path):
    df = _docs(spark, 60)
    out = str(tmp_path / "wds")
    write_webdataset(df, out, key_col="doc_id", members=MEMBERS, n_shards=5)
    back = read_webdataset(spark, out, members=MEMBERS)
    got = {
        r["key"]: (bytes(r["text"]).decode(), bytes(r["payload"]))
        for r in back.collect()
    }
    want = {
        r["doc_id"]: (r["text"], bytes(r["payload"])) for r in df.collect()
    }
    assert got == want


def test_samples_grouped_and_ordered_inside_shards(spark, tmp_path):
    out = str(tmp_path / "wds")
    write_webdataset(
        _docs(spark, 30), out, key_col="doc_id", members=MEMBERS, n_shards=2
    )
    for name, blob in _tar_bytes(out).items():
        with tarfile.open(fileobj=io.BytesIO(blob)) as tar:
            names = [i.name for i in tar]
        keys = [n.rsplit(".", 1)[0] for n in names]
        # loader contract: every sample's members adjacent...
        seen = []
        for k in keys:
            if not seen or seen[-1] != k:
                seen.append(k)
        assert len(set(seen)) == len(seen), f"{name}: interleaved samples"
        # ...and samples in key order, headers pinned
        assert seen == sorted(seen)
        with tarfile.open(fileobj=io.BytesIO(blob)) as tar:
            for i in tar:
                assert i.mtime == 0 and i.uid == 0 and i.mode == 0o644


def test_shard_assignment_is_key_hash(spark, tmp_path):
    out = str(tmp_path / "wds")
    write_webdataset(
        _docs(spark, 50), out, key_col="doc_id", members=MEMBERS, n_shards=4
    )
    # replay the documented rule in python
    for name, blob in _tar_bytes(out).items():
        shard = int(name.split("-")[1].split(".")[0])
        with tarfile.open(fileobj=io.BytesIO(blob)) as tar:
            for info in tar:
                key = info.name.rsplit(".", 1)[0]
                base = int(
                    hashlib.md5(key.encode()).hexdigest()[:8], 16
                ) % ((1 << 31) - 1)
                assert base % 4 == shard, (key, shard)


def test_null_members_skipped(spark, tmp_path):
    df = spark.createDataFrame(
        [("k1", "has text", None), ("k2", None, b"\x01\x02")],
        "doc_id string, text string, payload binary",
    )
    out = str(tmp_path / "wds")
    write_webdataset(df, out, key_col="doc_id", members=MEMBERS, n_shards=1)
    back = {
        r["key"]: (r["text"], r["payload"])
        for r in read_webdataset(spark, out, members=MEMBERS).collect()
    }
    assert bytes(back["k1"][0]).decode() == "has text"
    assert back["k1"][1] is None
    assert back["k2"][0] is None
    assert bytes(back["k2"][1]) == b"\x01\x02"


def test_commit_protocol_success_marker_and_no_temp_files(spark, tmp_path):
    import glob
    import os

    out = str(tmp_path / "wds")
    names = write_webdataset(
        _docs(spark), out, key_col="doc_id", members=MEMBERS, n_shards=4
    )
    # no stage files survive a successful write; _SUCCESS lists shards
    assert not glob.glob(os.path.join(out, ".*.tmp-*"))
    marker = os.path.join(out, "_SUCCESS")
    assert os.path.exists(marker)
    assert open(marker).read().splitlines() == names


def test_reader_ignores_inflight_temp_files(spark, tmp_path):
    # a concurrent/killed attempt's stage file (garbage bytes under a
    # .tmp-<attempt> name) must be invisible to the shard-*.tar glob
    out = str(tmp_path / "wds")
    write_webdataset(
        _docs(spark, 30), out, key_col="doc_id", members=MEMBERS, n_shards=2
    )
    with open(f"{out}/.shard-00001.tar.tmp-99", "wb") as f:
        f.write(b"\x00garbage not a tar\x00" * 10)
    got = read_webdataset(spark, out, members=MEMBERS)
    assert got.count() == 30  # garbage neither read nor fatal


def test_corrupt_shard_fails_loud_by_default_and_skips_whole_shard(
    spark, tmp_path
):
    import glob
    import os

    import pytest

    out = str(tmp_path / "wds")
    write_webdataset(
        _docs(spark, 60), out, key_col="doc_id", members=MEMBERS, n_shards=3
    )
    shards = sorted(glob.glob(os.path.join(out, "shard-*.tar")))
    assert len(shards) == 3
    # truncate one shard mid-member (the killed-mid-write shape that
    # the commit protocol prevents for OUR writer, but a foreign or
    # pre-protocol shard can still present)
    victim = shards[1]
    blob = open(victim, "rb").read()
    with open(victim, "wb") as f:
        f.write(blob[: len(blob) // 2 + 7])
    intact_keys = set()
    for p in (shards[0], shards[2]):
        with tarfile.open(p) as tar:
            intact_keys |= {m.name.rsplit(".", 1)[0] for m in tar}
    with pytest.raises(Exception, match="truncated tar"):
        read_webdataset(spark, out, members=MEMBERS).count()
    got = read_webdataset(spark, out, members=MEMBERS, on_corrupt="skip")
    rows = got.collect()
    # salvage read: every surviving sample is complete and comes from
    # an intact shard only — never a partial sample set of the victim
    assert {r["key"] for r in rows} == intact_keys
    assert all(r["text"] is not None and r["payload"] is not None for r in rows)


def test_read_requires_job_commit_marker(spark, tmp_path):
    """Task-level renames are not job commit (r9 review finding): a
    directory with committed-looking shards but NO _SUCCESS (a write
    job that died mid-way, or a foreign dir) must raise by default,
    and require_success=False falls back to the glob. Stale shards
    from a previous differently-sharded write are ignored because the
    marker lists only the committed set."""
    import os

    import pytest

    out = str(tmp_path / "wds")
    write_webdataset(
        _docs(spark, 30), out, key_col="doc_id", members=MEMBERS, n_shards=2
    )
    os.remove(os.path.join(out, "_SUCCESS"))
    with pytest.raises(FileNotFoundError, match="_SUCCESS"):
        read_webdataset(spark, out, members=MEMBERS)
    got = read_webdataset(spark, out, members=MEMBERS, require_success=False)
    assert got.count() == 30

    # stale-shard scenario: re-write the same dir with MORE shards,
    # then re-write with fewer — the marker-gated read sees only the
    # final committed set even though extra shard files linger
    write_webdataset(
        _docs(spark, 30), out, key_col="doc_id", members=MEMBERS, n_shards=8
    )
    write_webdataset(
        _docs(spark, 10), out, key_col="doc_id", members=MEMBERS, n_shards=2
    )
    committed = set(open(os.path.join(out, "_SUCCESS")).read().splitlines())
    import glob

    on_disk = {os.path.basename(p) for p in glob.glob(f"{out}/shard-*.tar")}
    assert on_disk - committed, "fixture must actually have stale shards"
    assert read_webdataset(spark, out, members=MEMBERS).count() == 10
