"""A6: debug index dump sink (SURVEY.md §2 A6).

The reference's DEBUG-only ``Table::dump_index`` writes the forward table
as ``doc_sign\\ttitle`` TSV, the inverted table as ``term\\tidf\\tdf`` TSV,
plus ``.md5`` sidecar files via an ``md5sum`` subprocess
(/root/reference/src/table.cpp:193-250, file_util.cpp:116-132).

Spark re-expression: TSV part-files via the CSV writer (the segment store
itself is already durable parquet — this sink exists for parity/debug
interchange), with an ``_integrity.json`` sidecar carrying each
part-file's md5 — same integrity intent, no subprocess."""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .build import SegmentStore


def _md5_sidecar(out_dir: str) -> None:
    sums = {}
    for name in sorted(os.listdir(out_dir)):
        if name.startswith(("_", ".")):
            continue
        h = hashlib.md5()
        with open(os.path.join(out_dir, name), "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        sums[name] = h.hexdigest()
    with open(os.path.join(out_dir, "_integrity.json"), "w") as f:
        json.dump({"algo": "md5", "files": sums}, f, indent=2)


def dump_fwd_table(spark: SparkSession, store: SegmentStore, out_dir: str) -> str:
    """Forward dump: doc_id \\t content_sha256 \\t doc_len \\t n_terms
    (the reference dumps doc_sign\\ttitle, table.cpp:212-230; content is
    represented by its sha256 — the per-row invariant column)."""
    (
        store.docs(spark)
        .select("doc_id", "content_sha256", "doc_len", "n_terms")
        .orderBy("doc_id")
        .write.mode("overwrite")
        .option("sep", "\t")
        .csv(out_dir)
    )
    _md5_sidecar(out_dir)
    return out_dir


def dump_inv_table(spark: SparkSession, store: SegmentStore, out_dir: str) -> str:
    """Inverted dump: term \\t idf \\t df \\t ttf (reference: term\\tidf\\tdf,
    table.cpp:232-250)."""
    (
        store.term_stats(spark)
        .select("term", F.round("idf", 6).alias("idf"), "df", "ttf")
        .orderBy("term")
        .write.mode("overwrite")
        .option("sep", "\t")
        .csv(out_dir)
    )
    _md5_sidecar(out_dir)
    return out_dir
