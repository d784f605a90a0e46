"""WebDataset-style tar-shard sink and source — the interchange format
multimodal training loaders consume (Aizman et al., "High Performance
I/O For Large Scale Deep Learning", IEEE BigData 2019; the webdataset
convention: one tar per shard, one file group per sample, members
named ``{key}.{extension}``).

A 100 TB multimodal corpus leaves the lakehouse as tar shards because
training dataloaders stream tars sequentially (object-store range
reads, no per-sample round trips). This sink writes them FROM a
DataFrame distributively and deterministically:

  * shard assignment is a pure function of the sample key
    (md5(key) mod n_shards — the dedup.md5_base_hash portability
    discipline), so re-running the write on any cluster layout
    produces the same sample->shard mapping;
  * rows are repartitioned BY shard id and sorted by key within
    partitions, and every tar header is pinned (mtime=0, uid/gid=0,
    fixed mode, USTAR format) — each shard's BYTES are reproducible
    run to run (test-proven), which makes shards content-addressable
    and diffable, the property lakehouse-style retention needs;
  * each executor writes only its own shards; nothing funnels through
    the driver. ``path`` must be shared storage at cluster scale (the
    same contract as every Spark file sink).

The source side (read_webdataset) walks tar members with the stdlib
(binaryFile + mapInPandas — the sources/warc.py pattern) and
reassembles one row per sample key, so round-trip equality is
testable end to end.

Rows-only surface: a tar sink has no ANSI-SQL twin; verification is
byte-determinism + round-trip + distribution tests
(tests/test_webdataset.py), the multimodal/codec discipline.

reference scope: beyond-reference sink family (SURVEY §4), next to
op4-csv-sink / jdbc-sink; the training-loader handoff the reference's
Postgres loader plays for its BI consumers.
"""

from __future__ import annotations

import io
import os
import tarfile
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MERSENNE_31 = (1 << 31) - 1


def _shard_col(key, n_shards: int):
    """Deterministic shard id: portable md5 hash of the key mod
    n_shards (layout- and engine-independent)."""
    base = F.pmod(
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast(
            "long"
        ),
        F.lit(_MERSENNE_31),
    )
    return F.pmod(base, F.lit(n_shards)).cast("int")


def write_webdataset(
    df: DataFrame,
    path: str,
    *,
    key_col: str,
    members: dict[str, str],
    n_shards: int = 8,
) -> list[str]:
    """Write ``df`` as WebDataset tar shards under ``path``.

    ``members`` maps column name -> member extension, e.g.
    ``{"text": "txt", "payload": "bin", "meta": "json"}``; string
    columns are utf-8 encoded, binary columns written as-is, null
    members skipped (the webdataset sparse-field convention). Sample
    keys must be unique; each sample's members are emitted adjacently
    (loader contract) in ``members`` order, samples in key order.

    Returns the shard file names written. Shards are
    ``shard-{id:05d}.tar``; ids with no samples produce no file
    (sparse small inputs stay sparse).

    A target directory admits ONE writer at a time (shard names and
    the ``_SUCCESS`` marker are directory-global); the job-commit
    orphan sweep relies on that contract.
    """
    cols = list(members)
    exts = dict(members)
    key_f = F.col(key_col)
    from pyspark import TaskContext

    staged = (
        df.select(
            key_f.cast("string").alias("__key"),
            _shard_col(key_f, n_shards).alias("__shard"),
            *[
                (
                    F.col(c)
                    if isinstance(df.schema[c].dataType, T.BinaryType)
                    else F.col(c).cast("string").cast("binary")
                ).alias(c)
                for c in cols
            ],
        )
        # all rows of one shard land in exactly one partition; a
        # partition may own several whole shards (grouped at write)
        .repartition(n_shards, "__shard")
        .sortWithinPartitions("__shard", "__key")
    )
    def write_partition(rows) -> Iterator[str]:
        # task-commit protocol (round-8 ADVICE): each shard is staged
        # to a temp name carrying the TaskContext attempt id, fsynced,
        # then os.rename'd to its final name — atomic on a POSIX
        # shared FS. A retried or speculative attempt therefore never
        # interleaves bytes with another attempt's write (each attempt
        # owns its temp file), an attempt killed mid-write leaves only
        # a `.tmp*` file the reader's `shard-*.tar` glob ignores, and
        # the last rename wins with IDENTICAL bytes (the shard content
        # is a pure function of its rows — byte-determinism test).
        ctx = TaskContext.get()
        attempt = ctx.taskAttemptId() if ctx is not None else 0
        os.makedirs(path, exist_ok=True)  # executor-side, not driver
        cur_shard = None
        tar = None
        buf = None

        def flush():
            nonlocal tar, buf, cur_shard
            if tar is None:
                return None
            tar.close()
            name = f"shard-{cur_shard:05d}.tar"
            tmp = os.path.join(path, f".{name}.tmp-{attempt}")
            final = os.path.join(path, name)
            with open(tmp, "wb") as f:
                f.write(buf.getvalue())
                f.flush()
                os.fsync(f.fileno())
            os.rename(tmp, final)
            tar = buf = None
            return name

        written = []
        for row in rows:
            if row["__shard"] != cur_shard:
                done = flush()
                if done:
                    written.append(done)
                cur_shard = row["__shard"]
                buf = io.BytesIO()
                tar = tarfile.open(
                    fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT
                )
            for c in cols:
                data = row[c]
                if data is None:
                    continue
                info = tarfile.TarInfo(name=f"{row['__key']}.{exts[c]}")
                info.size = len(data)
                info.mtime = 0
                info.mode = 0o644
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                tar.addfile(info, io.BytesIO(bytes(data)))
        done = flush()
        if done:
            written.append(done)
        return iter(written)

    names = sorted(
        staged.rdd.mapPartitions(
            lambda rows: write_partition(rows)
        ).collect()
    )
    # job-level commit: sweep orphaned stage files from killed or
    # superseded attempts (nothing else ever deletes them), then write
    # the _SUCCESS marker listing the committed shards — the reader's
    # default gate, written only after every task committed.
    import glob as _glob

    os.makedirs(path, exist_ok=True)
    # NOTE: a directory admits ONE writer at a time (concurrent jobs
    # would collide on the final shard-NNNNN.tar names and race on
    # _SUCCESS regardless) — under that contract every surviving stage
    # file belongs to a dead attempt of THIS job and is safe to sweep.
    for orphan in _glob.glob(os.path.join(path, ".shard-*.tar.tmp-*")):
        try:
            os.remove(orphan)
        except OSError:
            pass  # already gone / unreadable: the reader ignores it anyway
    with open(os.path.join(path, "_SUCCESS"), "w") as f:
        f.write("\n".join(names))
    return names


def read_webdataset(
    spark: SparkSession,
    path: str,
    *,
    members: dict[str, str],
    on_corrupt: str = "fail",
    require_success: bool = True,
) -> DataFrame:
    """Read tar shards back into one row per sample key. ``members``
    is the same column->extension map the writer took; missing members
    come back null. Tar walking is stdlib-in-executor (binaryFile +
    mapInPandas, the warc.py fetchless pattern) — shards stream
    through Arrow batches, never the driver.

    Only JOB-COMMITTED shards are read (round-9 review fix: task-level
    rename alone is not job commit): with ``require_success`` (the
    default) the shard list comes from the ``_SUCCESS`` marker the
    writer emits after every task committed — a write job that died
    mid-way (some shards renamed, no marker) raises instead of
    returning a partial corpus, and stale ``shard-*.tar`` files from a
    previous differently-sharded write into the same directory are
    ignored because they are not in the marker. Set
    ``require_success=False`` to glob ``shard-*.tar`` from a foreign /
    pre-protocol directory; in-flight ``.tmp-{attempt}`` stage files
    are invisible either way.

    ``on_corrupt``: ``"fail"`` (default) raises on a truncated or
    corrupted tar; ``"skip"`` drops the WHOLE damaged shard — never a
    partial sample set from it, so a salvage read sees only shards
    whose every member parsed (samples are per-shard by construction:
    the writer maps each key to exactly one shard)."""
    import pandas as pd

    if on_corrupt not in ("fail", "skip"):
        raise ValueError(f"on_corrupt must be 'fail' or 'skip': {on_corrupt}")
    ext_to_col = {v: k for k, v in members.items()}
    binary_cols = set(members)
    fields = ", ".join(f"{c} binary" for c in members)
    schema = f"key string, {fields}"

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import warnings

        for pdf in batches:
            out: list[dict] = []
            for shard_path, blob in zip(pdf["path"], pdf["content"]):
                samples: dict[str, dict] = {}
                try:
                    raw = bytes(blob)
                    # stdlib tarfile treats a mid-archive EOF as end
                    # of archive (SILENT sample loss), so integrity is
                    # checked structurally first: every committed
                    # shard is 512-aligned and ends with the two-zero-
                    # block terminator (tarfile.close() guarantees it)
                    if (
                        len(raw) < 1024
                        or len(raw) % 512
                        or raw[-1024:] != b"\x00" * 1024
                    ):
                        raise tarfile.ReadError(
                            "truncated tar: missing end-of-archive marker"
                        )
                    with tarfile.open(fileobj=io.BytesIO(raw)) as tar:
                        for info in tar:
                            if not info.isfile() or "." not in info.name:
                                continue
                            key, ext = info.name.rsplit(".", 1)
                            col = ext_to_col.get(ext)
                            if col is None:
                                continue
                            data = tar.extractfile(info).read()
                            if len(data) != info.size:
                                raise tarfile.ReadError(
                                    f"truncated member {info.name}"
                                )
                            samples.setdefault(key, {})[col] = data
                except (tarfile.TarError, EOFError) as exc:
                    if on_corrupt == "fail":
                        raise
                    samples = {}  # drop the whole damaged shard — loudly
                    warnings.warn(
                        f"read_webdataset: skipping corrupt shard "
                        f"{shard_path}: {exc}",
                        RuntimeWarning,
                        stacklevel=2,
                    )
                for key in sorted(samples):
                    row = {"key": key}
                    for c in binary_cols:
                        row[c] = samples[key].get(c)
                    out.append(row)
            yield pd.DataFrame(
                out, columns=["key", *binary_cols]
            ) if out else pd.DataFrame(
                {c: pd.Series(dtype="object") for c in ["key", *binary_cols]}
            )

    if require_success:
        marker = os.path.join(path, "_SUCCESS")
        if not os.path.exists(marker):
            raise FileNotFoundError(
                f"no _SUCCESS marker under {path}: the write job never "
                "committed (or this is a foreign WebDataset directory — "
                "pass require_success=False to glob shard-*.tar directly)"
            )
        with open(marker) as fh:
            names = [ln for ln in fh.read().splitlines() if ln]
        reader = spark.read.format("binaryFile")
        blobs = reader.load(
            [os.path.join(path, n) for n in names]
        ).select("path", "content")
    else:
        blobs = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "shard-*.tar")
            .load(path)
            .select("path", "content")
        )
    return blobs.mapInPandas(parse, schema=schema)
