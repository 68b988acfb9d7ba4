"""WebDataset tar-shard sink + source (the multimodal training-data
interchange format used by img2dataset / LAION-scale pipelines).

A WebDataset is a directory of POSIX tar shards; each SAMPLE is a
group of adjacent members sharing a basename — ``000123.png`` +
``000123.json`` — so a trainer streams samples sequentially with no
index and shuffles by shard.  This module closes the media loop the
way ``shards.write_training_shards`` closes the text loop: curated
assets (``media_prep.run_media_prep`` output) go OUT as tar shards,
and crawled shard archives come IN as asset rows.

Spark-first shape:

- the sink assigns contiguous key ranges to shards via
  ``repartitionByRange`` + ``sortWithinPartitions`` (no global sort),
  then ONE ``mapInPandas`` pass per shard writes the tar — payloads
  never shuffle beyond the single range exchange, and each task owns
  exactly one output file (the one-file-per-bucket discipline).
- tars are BYTE-DETERMINISTIC: fixed mtime/uid/gid/mode, sorted member
  order (key asc, payload member before metadata), USTAR format — the
  same curated corpus always produces bit-identical shards, so shard
  checksums are release fingerprints.
- the source reads shards via ``binaryFile`` (one task per tar, the
  WARC pattern) and walks members sequentially; member bytes exist
  once per row batch, never corpus-wide.

Local paths here; on a cluster the tar bytes would stream through the
Hadoop FileSystem API exactly like ``sources/warc.py``'s writer — the
task-local tar assembly is the same.
"""

from __future__ import annotations

import io
import json
import os
import tarfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _tarinfo(name: str, size: int) -> tarfile.TarInfo:
    ti = tarfile.TarInfo(name=name)
    ti.size = size
    ti.mtime = 0
    ti.uid = ti.gid = 0
    ti.uname = ti.gname = ""
    ti.mode = 0o644
    return ti


def write_webdataset(
    assets: DataFrame,
    path: str,
    samples_per_shard: int = 1_000,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    ext_col: str | None = None,
    default_ext: str = "bin",
    n_shards: int | None = None,
) -> dict:
    """Write assets as WebDataset tar shards under ``path`` (created);
    returns the manifest dict (also written as ``_manifest.json``).

    Every column other than id/payload/ext becomes the sample's
    ``.json`` metadata member (sorted keys, deterministic).  Keys must
    be unique — duplicate keys would silently merge samples, so the
    writer asserts per-shard uniqueness and raises on violation.
    ``n_shards`` defaults from a count; pass it to skip the count job.
    """
    if n_shards is None:
        n_shards = max(1, -(-assets.count() // samples_per_shard))
    os.makedirs(path, exist_ok=True)
    meta_cols = [c for c in assets.columns
                 if c not in (id_col, payload_col, ext_col)]
    cols = [F.col(id_col).cast("string").alias("__key"),
            F.col(payload_col).alias("__payload")]
    cols.append((F.col(ext_col) if ext_col else F.lit(default_ext))
                .alias("__ext"))
    cols += [F.col(c) for c in meta_cols]
    rows = (
        assets.select(*cols)
        .repartitionByRange(n_shards, F.col("__key"))
        .sortWithinPartitions("__key")
    )

    def write_shards(batches):
        import pandas as pd
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        shard_name = f"shard-{pid:05d}.tar"
        tar_path = os.path.join(path, shard_name)
        n, total = 0, 0
        seen = set()
        with tarfile.open(tar_path, "w", format=tarfile.USTAR_FORMAT) as tf:
            for pdf in batches:
                for r in pdf.to_dict("records"):
                    key = r["__key"]
                    if key in seen:
                        raise ValueError(
                            f"duplicate sample key {key!r} in shard "
                            f"{shard_name} — keys must be unique")
                    seen.add(key)
                    payload = bytes(r["__payload"] or b"")
                    tf.addfile(_tarinfo(f"{key}.{r['__ext']}",
                                        len(payload)),
                               io.BytesIO(payload))
                    meta = {c: r[c] for c in meta_cols}
                    mb = json.dumps(meta, sort_keys=True,
                                    default=str).encode()
                    tf.addfile(_tarinfo(f"{key}.json", len(mb)),
                               io.BytesIO(mb))
                    n += 1
                    total += len(payload)
        if n == 0:
            os.remove(tar_path)          # empty range partition
            return iter(())
        return iter([pd.DataFrame(
            [{"shard": shard_name, "n_samples": n, "n_bytes": total}])])

    stats = rows.mapInPandas(
        write_shards, schema="shard string, n_samples long, n_bytes long"
    ).collect()
    manifest = {
        "format": "webdataset",
        "n_shards": len(stats),
        "n_samples": int(sum(r.n_samples for r in stats)),
        "n_payload_bytes": int(sum(r.n_bytes for r in stats)),
        "shards": sorted(
            ({"shard": r.shard, "n_samples": r.n_samples,
              "n_bytes": r.n_bytes} for r in stats),
            key=lambda d: d["shard"]),
    }
    with open(os.path.join(path, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def stream_webdataset(spark: SparkSession, path: str,
                      max_files_per_trigger: int | None = None) -> DataFrame:
    """Streaming twin of :func:`read_webdataset` (the ``stream_warc``
    pattern): tar shards LANDING in ``path`` become micro-batches of
    sample rows, plus ``ingest_ts`` (shard file mtime) for
    watermarking.  Compose with
    ``streaming.ingest.run_incremental_media_ingest`` for the full
    accreting media pipeline: land shards → decode-once hash →
    perceptual dedup vs the kept corpus → admit.  The file-source
    checkpoint remembers consumed shards, so restarts resume with only
    new arrivals."""
    reader = (spark.readStream.format("binaryFile")
              .schema("path string, modificationTime timestamp, "
                      "length long, content binary")
              .option("pathGlobFilter", "*.tar"))
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.load(path)
    return src.select("path", "modificationTime", "content").mapInPandas(
        _parse_tars(with_ts=True),
        schema=(_SAMPLE_SCHEMA + ", ingest_ts timestamp"))


_SAMPLE_SCHEMA = ("shard string, key string, ext string, payload binary, "
                  "meta_json string, n_extra_members int, "
                  "extra_payloads map<string,binary>")


def _parse_tars(with_ts: bool = False):
    def parse(batches):
        import pandas as pd
        cols = ["shard", "key", "ext", "payload", "meta_json",
                "n_extra_members", "extra_payloads"] \
            + (["ingest_ts"] if with_ts else [])
        for pdf in batches:
            out = []
            for r in pdf.to_dict("records"):
                shard = os.path.basename(r["path"])
                samples: dict[str, dict] = {}
                order: list[str] = []
                with tarfile.open(
                        fileobj=io.BytesIO(r["content"])) as tf:
                    for m in tf:
                        if not m.isfile():
                            continue
                        base, ext = os.path.splitext(m.name)
                        ext = ext.lstrip(".")
                        if base not in samples:
                            samples[base] = {"payload": None, "ext": None,
                                             "meta": None, "extra": {}}
                            order.append(base)
                        blob = tf.extractfile(m).read()
                        s = samples[base]
                        if ext == "json":
                            s["meta"] = blob.decode("utf-8")
                        elif s["payload"] is None:
                            s["payload"], s["ext"] = blob, ext
                        else:
                            # the .jpg + .txt multi-payload shape: every
                            # member past the first is SURFACED, keyed
                            # by ext (disambiguated on collision) — an
                            # externally-produced WebDataset loses
                            # nothing on read
                            k = ext
                            i = 1
                            while k in s["extra"]:
                                k = f"{ext}#{i}"
                                i += 1
                            s["extra"][k] = blob
                for base in order:
                    s = samples[base]
                    row = {"shard": shard, "key": base, "ext": s["ext"],
                           "payload": s["payload"], "meta_json": s["meta"],
                           "n_extra_members": len(s["extra"]),
                           "extra_payloads": s["extra"] or None}
                    if with_ts:
                        row["ingest_ts"] = r["modificationTime"]
                    out.append(row)
            yield pd.DataFrame(out, columns=cols)
    return parse


def read_webdataset(spark: SparkSession, path: str) -> DataFrame:
    """Tar shards → one row per sample:
    (shard, key, ext, payload, meta_json, n_extra_members,
    extra_payloads).

    One ``binaryFile`` task per tar (the WARC pattern); members are
    walked sequentially and grouped by basename — the payload member is
    the first non-``.json`` member, the ``.json`` member rides along as
    a string for ``json_ops.parse_json`` downstream.  Additional
    payload members (the common ``.jpg`` + ``.txt`` WebDataset sample
    shape) come back in ``extra_payloads`` — a ``map<ext, binary>``
    with ``#1``/``#2`` suffixes on ext collisions — so a roundtrip of
    an externally-produced multi-payload WebDataset is lossless
    (round-9 review; previously counted-but-dropped).
    """
    bins = spark.read.format("binaryFile").load(
        os.path.join(path, "*.tar"))
    return bins.select("path", "content").mapInPandas(
        _parse_tars(with_ts=False), schema=_SAMPLE_SCHEMA)
