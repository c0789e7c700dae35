"""WebDataset-style tar-shard IO for training samples.

The multimodal-training ecosystem ships samples as tar archives of
``<key>.<ext>`` members (text, json metadata, image/audio payloads),
sharded so loaders stream shards sequentially — the POSIX-tar
convention popularized by the webdataset library. This module reads and
writes that layout with only the stdlib ``tarfile``:

* :func:`write_tar_shards` — deterministic sharding (``pmod(xxhash64(
  key), n_shards)``), key-sorted members inside each shard, zeroed
  mtime/uid/gid so a shard's BYTES are a pure function of its rows
  (re-runs produce identical archives — the same replayability posture
  as the stored FTS index). One Arrow-batched ``applyInPandas`` group
  per shard; executors append to a shared filesystem path (the same
  assumption every webdataset shard writer makes).
* :func:`read_tar_shards` — shard paths parallelized across the
  cluster, one ``mapInPandas`` task per batch of shards; each sample's
  members are re-grouped by key into one row. Reading N shards is an
  embarrassingly parallel scan: no shuffle anywhere.

Scale notes: shard count is the parallelism unit (pick ~total_bytes /
1 GB in production); both directions stream member bytes through Arrow
batches without collecting anything to the driver. String columns are
stored utf-8, binary columns raw.
"""

from __future__ import annotations

import glob as _glob
import io
import os
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _shard_name(sid: int) -> str:
    return f"shard-{sid:05d}.tar"


def write_tar_shards(
    df: DataFrame,
    path: str,
    *,
    key_col: str,
    members: dict[str, str],
    n_shards: int = 8,
) -> DataFrame:
    """Write ``df`` as ``n_shards`` tar shards under ``path``; returns
    the manifest (shard_path, n_samples, n_bytes) as a DataFrame.

    ``members`` maps member extension -> source column, e.g.
    ``{"txt": "text", "json": "meta"}`` writes ``<key>.txt`` and
    ``<key>.json`` per row. String columns are utf-8 encoded; binary
    columns are written raw. The write is an action (the manifest is
    materialized) so the archives exist on return.
    """
    os.makedirs(path, exist_ok=True)
    for old in _glob.glob(os.path.join(path, "shard-*.tar")):
        os.remove(old)
    cols = [key_col, *members.values()]
    exts = list(members.keys())
    src_cols = list(members.values())

    sharded = df.select(
        F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards)).alias("_shard"),
        *cols,
    )

    def write_group(pdf: pd.DataFrame) -> pd.DataFrame:
        sid = int(pdf["_shard"].iloc[0])
        pdf = pdf.sort_values(key_col, kind="mergesort")
        if pdf[key_col].duplicated().any():
            # duplicate keys would collide on member names and the read
            # side would silently keep one copy — refuse loudly instead
            dupes = pdf[key_col][pdf[key_col].duplicated()].iloc[:3]
            raise ValueError(
                f"duplicate sample keys in shard {sid}: {list(dupes)}"
            )
        out = os.path.join(path, _shard_name(sid))
        n = 0
        key_vals = pdf[key_col].tolist()
        col_vals = {col: pdf[col].tolist() for col in src_cols}
        with tarfile.open(out, "w") as tf:
            for ridx, key in enumerate(key_vals):
                for ext, col in zip(exts, src_cols):
                    payload = col_vals[col][ridx]
                    if payload is None:
                        continue
                    data = (
                        payload.encode("utf-8")
                        if isinstance(payload, str)
                        else bytes(payload)
                    )
                    info = tarfile.TarInfo(name=f"{key}.{ext}")
                    info.size = len(data)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    tf.addfile(info, io.BytesIO(data))
                n += 1
        return pd.DataFrame(
            {
                "shard_path": [out],
                "n_samples": [n],
                "n_bytes": [os.path.getsize(out)],
            }
        )

    manifest = sharded.groupBy("_shard").applyInPandas(
        write_group, schema="shard_path string, n_samples long, n_bytes long"
    )
    # materialize: the write is the point, the manifest proves it ran
    return manifest.sparkSession.createDataFrame(
        manifest.collect(), schema="shard_path string, n_samples long, n_bytes long"
    )


def read_tar_shards(
    spark: SparkSession,
    path: str,
    *,
    members: dict[str, str],
    binary: tuple = (),
) -> DataFrame:
    """Read tar shards back: one row per sample key with a column per
    member (``members`` maps extension -> output column). Members in
    ``binary`` stay ``binary`` columns; all others decode utf-8 to
    string. The key column is returned as string ``sample_key`` (cast
    downstream — tar member names are strings by construction)."""
    shard_paths = sorted(_glob.glob(os.path.join(path, "shard-*.tar")))
    exts = dict(members)
    bin_set = set(binary)
    fields = ["sample_key string"] + [
        f"{col} {'binary' if ext in bin_set else 'string'}"
        for ext, col in exts.items()
    ]
    schema = ", ".join(fields)
    # explicit schema: an empty shard directory is a valid (empty)
    # dataset, and createDataFrame cannot infer a schema from []
    paths_df = spark.createDataFrame(
        [(p,) for p in shard_paths], "p string"
    )

    def read_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, dict] = {}
            for p in pdf["p"]:
                with tarfile.open(p, "r") as tf:
                    for m in tf.getmembers():
                        base, dot, ext = m.name.rpartition(".")
                        if not dot or ext not in exts:
                            continue
                        data = tf.extractfile(m).read()
                        col = exts[ext]
                        rows.setdefault(base, {})[col] = (
                            data if ext in bin_set else data.decode("utf-8")
                        )
            out = {
                "sample_key": list(rows.keys()),
                **{
                    col: [rows[k].get(col) for k in rows]
                    for col in exts.values()
                },
            }
            yield pd.DataFrame(out)

    return paths_df.mapInPandas(read_batch, schema=schema)
