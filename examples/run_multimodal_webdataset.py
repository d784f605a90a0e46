"""End-to-end multimodal TRAINING-DATA pipeline (round-10 verdict
Next #4): the pieces that already exist composed as one flow —

    media fixture (real stdlib codecs: PNGs with a planted exact byte
    copy, a re-encode near-dup, and a cross-format JPEG/PNG twin;
    plus a too-small image and a WAV that the filters must drop) ->
    binaryFile ingest -> expression-level mime/dimension sniffing ->
    metadata filter (images, min dimensions) -> exact binary dedup ->
    PERCEPTUAL near-dup dedup on decoded pixels (aHash + pigeonhole
    hamming join, greedy min-id survivor rule) -> real 16x16 resize
    (decode/resample/re-encode) -> WebDataset tar-shard sink ->
    round-trip parity between the engine's Spark reader and a
    vendored stdlib loader following the PUBLIC webdataset
    member-pairing rule (key = basename up to the FIRST dot,
    consecutive members group into one sample).

Every heavy stage is the Arrow-batched mapInPandas the 100 TB path
uses; only fixture generation is driver-side. The survivor rule here
is the greedy pairwise one (drop the higher media_id of each verified
pair) — corpora with long duplicate chains route through the
connected-components operator (operators/dedup.py) instead.

    python examples/run_multimodal_webdataset.py [work_dir]
"""

from __future__ import annotations

import io
import math
import os
import sys
import tarfile
from collections.abc import Iterator

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from firmable_aus_etl_spark.multimodal import (
    dedup_media_exact,
    dedup_media_perceptual,
    read_binary_dir,
    resize_images,
    with_media_metadata,
)
from firmable_aus_etl_spark.multimodal import jpeg as J
from firmable_aus_etl_spark.multimodal import png as P
from firmable_aus_etl_spark.multimodal import wav as W
from firmable_aus_etl_spark.session import get_session
from firmable_aus_etl_spark.sources.webdataset import (
    read_webdataset,
    write_webdataset,
)

MEMBERS = {"image": "img", "meta": "json"}
MIN_DIM = 16
THUMB = 16


def _pattern(kind: str, w: int = 32, h: int = 32) -> bytes:
    """Visually DISTINCT grayscale test patterns (aHash-separated by
    construction: ramps in different directions, checkers at different
    scales) so the only perceptual pairs are the planted ones."""
    px = bytearray()
    for y in range(h):
        for x in range(w):
            if kind == "ramp_h":
                v = x * 8
            elif kind == "ramp_h_inv":
                v = 255 - x * 8
            elif kind == "ramp_v":
                v = y * 8
            elif kind == "ramp_diag":
                v = (x + y) * 4
            elif kind == "checker4":
                v = 255 if (x // 4 + y // 4) % 2 else 0
            else:  # checker8
                v = 255 if (x // 8 + y // 8) % 2 else 0
            px.append(min(255, v))
    return bytes(px)


def build_fixture(d: str) -> dict[str, int]:
    """Write the media corpus; returns the planted expectations."""
    os.makedirs(d, exist_ok=True)
    kinds = ["ramp_h", "ramp_h_inv", "ramp_v", "ramp_diag", "checker4", "checker8"]
    for k in kinds:
        open(os.path.join(d, f"{k}.png"), "wb").write(
            P.encode_png(_pattern(k), 32, 32)
        )
    # exact byte copy (dropped by exact dedup)
    open(os.path.join(d, "ramp_h_copy.png"), "wb").write(
        P.encode_png(_pattern("ramp_h"), 32, 32)
    )
    # re-encode: same pixels, different bytes (perceptual pair #1)
    open(os.path.join(d, "ramp_v_reenc.png"), "wb").write(
        P.encode_png(_pattern("ramp_v"), 32, 32, filter_type=4,
                     text_chunks={"Software": "another encoder"})
    )
    # cross-format twin: smooth ramp as high-quality JPEG + PNG
    # (perceptual pair #2 — survives lossy re-encoding)
    smooth = bytes(min(255, x * 4 + y * 3) for y in range(32) for x in range(32))
    open(os.path.join(d, "smooth.jpg"), "wb").write(
        J.encode_jpeg(smooth, 32, 32, quality=95)
    )
    open(os.path.join(d, "smooth.png"), "wb").write(P.encode_png(smooth, 32, 32))
    # filtered out: an 8x8 thumbnail (below MIN_DIM) and an audio clip
    open(os.path.join(d, "tiny.png"), "wb").write(
        P.encode_png(_pattern("checker4", 8, 8), 8, 8)
    )
    tone = [int(9000 * math.sin(2 * math.pi * 440 * i / 16000)) for i in range(4000)]
    open(os.path.join(d, "tone.wav"), "wb").write(W.encode_wav(tone))
    return {
        "files": len(kinds) + 6,
        "filtered_in": len(kinds) + 4,  # images >= MIN_DIM
        "after_exact": len(kinds) + 3,  # byte copy dropped
        "perceptual_pairs": 2,
        "survivors": len(kinds) + 1,  # reenc + one of the jpg/png twins dropped
    }


def stream_samples_public_rule(shard_path: str) -> Iterator[dict]:
    """Vendored MINIMAL loader iterator replicating the PUBLIC
    webdataset reader's member-pairing rule (webdataset
    ``group_by_keys``): key = member basename up to the FIRST dot
    (extension = everything after it), CONSECUTIVE members with the
    same key form one sample. Pure stdlib — this is the consumer-side
    contract our sink claims to satisfy.

    Interop note (tested in tests/test_webdataset_interop.py): our own
    reader splits at the LAST dot, so the two rules agree exactly when
    sample keys are dot-free — which the writer's key discipline
    (stringified ids) guarantees here. Dotted keys would pair
    differently under the public rule; keep keys dot-free."""
    sample: dict = {}
    with tarfile.open(shard_path) as tar:
        for info in tar:
            if not info.isfile() or "." not in info.name:
                continue
            key, ext = info.name.split(".", 1)  # FIRST dot: public rule
            if sample.get("__key__") not in (None, key):
                yield sample
                sample = {}
            sample["__key__"] = key
            sample[ext] = tar.extractfile(info).read()
    if sample:
        yield sample


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mm_wds_demo"
    media_dir = os.path.join(work, "media")
    out = os.path.join(work, "train_wds")
    expect = build_fixture(media_dir)
    spark = get_session("multimodal-webdataset-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. ingest + sniff (expressions only — no Python in this stage)
    media = with_media_metadata(read_binary_dir(spark, media_dir))
    n_files = media.count()
    print(f"ingested {n_files} files")

    # 2. metadata filter: trainable images only
    images = media.filter(
        (F.col("media_type") == "image")
        & (F.col("meta.width") >= MIN_DIM)
        & (F.col("meta.height") >= MIN_DIM)
    )
    n_images = images.count()

    # 3. exact binary dedup (content-hash window, lowest id wins)
    uniq = dedup_media_exact(images)
    n_exact = uniq.count()

    # 4. perceptual near-dup pairs on DECODED pixels, then the greedy
    #    min-id survivor rule: every verified pair (a<b) drops b
    pairs = dedup_media_perceptual(uniq, max_hamming=3)
    n_pairs = pairs.count()
    survivors = uniq.join(
        pairs.select(F.col("b_id").alias("media_id")).distinct(),
        "media_id",
        "left_anti",
    )
    n_surv = survivors.count()
    print(
        f"images>=16px {n_images} -> exact-dedup {n_exact} -> "
        f"{n_pairs} perceptual pairs -> {n_surv} survivors"
    )

    # 5. real resize to the training shape (decode -> nearest ->
    #    re-encode in source format), metadata re-joined for the sink
    thumbs = resize_images(survivors, width=THUMB, height=THUMB)
    staged = thumbs.join(
        survivors.select(
            "media_id",
            F.to_json(F.struct("uri", "mime", "meta")).alias("meta"),
        ),
        "media_id",
    ).select(F.col("media_id").cast("string").alias("key"), "content", "meta")

    # 6. committed WebDataset shards (deterministic shard map, task
    #    temp+rename commit, _SUCCESS gate)
    names = write_webdataset(
        staged.withColumnRenamed("content", "image"),
        out,
        key_col="key",
        members=MEMBERS,
        n_shards=4,
    )
    print(f"wrote {len(names)} shards -> {out}")

    # 7. parity: engine reader vs the vendored public-rule loader
    back = read_webdataset(spark, out, members=MEMBERS)
    engine = {
        r["key"]: bytes(r["image"]) for r in back.collect()
    }
    loaded: dict[str, bytes] = {}
    for shard in names:
        for s in stream_samples_public_rule(os.path.join(out, shard)):
            loaded[s["__key__"]] = s["img"]
    assert engine.keys() == loaded.keys(), "sample-key sets diverge"
    assert all(engine[k] == loaded[k] for k in engine), "bytes diverge"
    assert len(engine) == n_surv == expect["survivors"], (
        len(engine),
        n_surv,
        expect,
    )
    print(
        f"engine reader and public-rule loader agree on "
        f"{len(engine)} samples ({THUMB}x{THUMB} thumbnails)"
    )


if __name__ == "__main__":
    main()
