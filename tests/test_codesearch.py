"""Trigram code search (pipeline/codesearch.py): prune-then-verify must
equal the exact brute scan — for literals and regexes, across the pruned
and full-scan paths, with hot grams and overlapping occurrences."""

import pytest
from pyspark.sql import functions as F

from tiny_search_engine_spark.pipeline import codesearch as cs


DOCS = [
    (1, "def make_table(key, value): return dict(key=value)"),
    (2, "table = make_table('k', 'v')  # table table table"),
    (3, "for row in rows: scan(row)"),
    (4, "aaaa"),  # overlapping occurrences of "aa"
    (5, "x"),  # shorter than a trigram: no postings
    (6, "the the the the common boilerplate line"),
    (7, "merge batch sort window"),
    (8, ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def brute_literal(needle):
    out = []
    for did, text in DOCS:
        n = text.count(needle)  # count() is non-overlapping, like replace()
        if needle and needle in text:
            out.append((did, n))
    return sorted(out)


def test_postings_shape(spark, docs):
    post = cs.trigram_postings(docs).collect()
    assert all(len(r.gram) == 3 for r in post)
    by_doc = {}
    for r in post:
        by_doc.setdefault(r.doc_id, []).append(r.gram)
    assert 5 not in by_doc and 8 not in by_doc  # sub-trigram docs: empty
    assert sorted(by_doc[4]) == ["aaa"]  # deduped within the doc
    assert len(by_doc[1]) == len(set(by_doc[1]))


@pytest.mark.parametrize(
    "needle",
    ["table", "make_table('k'", "aa", "zzq", "row", "the ", "dict(key=value)"],
)
def test_literal_matches_brute(spark, docs, needle):
    got = sorted(
        (r.doc_id, r.n_occurrences)
        for r in cs.search_literal(docs, [(0, needle)]).collect()
    )
    assert got == brute_literal(needle)


def test_literal_many_queries_and_max_grams(spark, docs):
    queries = [(i, n) for i, n in enumerate(["table", "aa", "scan(row)", "zz"])]
    for max_grams in (1, 2, 8):
        got = {
            (r.query_id, r.doc_id, r.n_occurrences)
            for r in cs.search_literal(docs, queries, max_grams=max_grams).collect()
        }
        want = {
            (qid, did, n)
            for qid, needle in queries
            for did, n in brute_literal(needle)
        }
        assert got == want, f"max_grams={max_grams}"


def test_duplicate_query_ids_refused(spark, docs):
    with pytest.raises(ValueError, match="duplicate query_id"):
        cs.search_literal(docs, [(1, "table"), (1, "scan")])
    with pytest.raises(ValueError, match="duplicate query_id"):
        cs.search_regex(docs, [(2, "tab."), (2, "sca.")])


def test_literal_scan_gate(spark, docs):
    with pytest.raises(ValueError, match="full scan"):
        cs.search_literal(docs, [(0, "aa")], allow_scan=False)
    # pruned-path needles still fine with the gate closed
    assert cs.search_literal(docs, [(0, "table")], allow_scan=False).count() == 2


def test_required_literal_extractor():
    assert cs.required_literal("make_table") == "make_table"
    assert cs.required_literal("merge .atch") == "merge "
    assert cs.required_literal("table{2,3}") == "tabl"  # last char may repeat
    assert cs.required_literal("tables*") == "table"
    assert cs.required_literal("tab?le") == ""  # runs "ta","le" both < 3
    assert cs.required_literal("scan\\(row\\)") == "scan"  # escape breaks run
    assert cs.required_literal("key|value") == ""  # alternation: unsound
    assert cs.required_literal("ro[wx]s") == ""  # class: unsound
    assert cs.required_literal("row+s") == "row"  # + keeps the char
    assert cs.required_literal("^def make") == "def make"


@pytest.mark.parametrize(
    "pattern",
    [
        "make_table",  # pure literal
        "merge .atch",  # dot: prune on "merge "
        "table table",  # repeated literal
        "row+s?",  # + keeps "row"
        "key|value",  # alternation: full-scan path
        "ro[wx]",  # class: full-scan path
        "zzq.*never",  # absent literal: empty via gdf=0 gram
    ],
)
def test_regex_matches_brute(spark, docs, pattern):
    import re

    got = sorted(r.doc_id for r in cs.search_regex(docs, [(0, pattern)]).collect())
    want = sorted(did for did, text in DOCS if re.search(pattern, text))
    assert got == want


def test_regex_scan_gate(spark, docs):
    with pytest.raises(ValueError, match="required literal"):
        cs.search_regex(docs, [(0, "key|value")], allow_scan=False)


def test_precomputed_postings_reused(spark, docs):
    post = cs.trigram_postings(docs)
    a = sorted(map(tuple, cs.search_literal(docs, [(0, "table")], postings=post).collect()))
    b = sorted(map(tuple, cs.search_literal(docs, [(0, "table")]).collect()))
    assert a == b


def test_trigram_store_roundtrip_and_pruning(spark, docs, tmp_path):
    store = str(tmp_path / "tgstore")
    cs.write_trigram_store(docs, store, n_buckets=8)
    # store-backed search == direct search
    queries = [(1, "table"), (2, "scan(row)"), (3, "zzq"), (4, "aa")]
    a = sorted(
        map(tuple, cs.search_literal_store(spark, store, docs, queries).collect())
    )
    b = sorted(map(tuple, cs.search_literal(docs, queries).collect()))
    assert a == b
    # regex twin: pruned pattern + full-scan alternation, via the store
    rq = [(1, "make_.able"), (2, "row|scan")]
    ra = sorted(map(tuple, cs.search_regex_store(spark, store, docs, rq).collect()))
    rb = sorted(map(tuple, cs.search_regex(docs, rq).collect()))
    assert ra == rb and ra
    # partition pruning: a single-gram load actually READS fewer files
    # (inputFiles() ignores pushdown, so probe with input_file_name())
    def files_read(df):
        return {r.f for r in df.select(F.input_file_name().alias("f")).distinct().collect()}

    all_files = files_read(cs.load_trigram_postings(spark, store))
    pruned = files_read(cs.load_trigram_postings(spark, store, {"tab"}))
    assert pruned and pruned < all_files
    # driver-side bucket hash == writer's F.xxhash64 routing: the pruned
    # load still contains every posting of the gram
    full = {
        (r.doc_id, r.gram)
        for r in cs.load_trigram_postings(spark, store).filter(F.col("gram") == "tab").collect()
    }
    got = {
        (r.doc_id, r.gram)
        for r in cs.load_trigram_postings(spark, store, {"tab"})
        .filter(F.col("gram") == "tab")
        .collect()
    }
    assert got == full and full


def test_trigram_store_incremental_matches_rebuild(spark, tmp_path):
    """update_trigram_store (add + replace + delete) == a fresh rebuild of
    the final corpus, before AND after compaction; a replaced doc's new
    postings survive its own tombstone."""
    store = str(tmp_path / "tg_inc")
    base = spark.createDataFrame(DOCS, "doc_id long, text string")
    cs.write_trigram_store(base, store, n_buckets=8)

    # delta: new doc 10, replace doc 1, delete doc 3
    delta = spark.createDataFrame(
        [(10, "brand new document body"), (1, "replacement text for one")],
        "doc_id long, text string",
    )
    cs.update_trigram_store(delta, store, deleted_ids=[3])

    final_rows = [(d, t) for d, t in DOCS if d not in (1, 3)] + [
        (10, "brand new document body"),
        (1, "replacement text for one"),
    ]
    final = spark.createDataFrame(final_rows, "doc_id long, text string")
    want_store = str(tmp_path / "tg_rebuild")
    cs.write_trigram_store(final, want_store, n_buckets=8)

    def postings(path):
        return {
            (r.doc_id, r.gram)
            for r in cs.load_trigram_postings(spark, path).collect()
        }

    assert postings(store) == postings(want_store)
    # pruned loads see the delta too
    got = {
        (r.doc_id, r.gram)
        for r in cs.load_trigram_postings(spark, store, {"bra"}).collect()
        if r.gram == "bra"
    }
    assert got == {(10, "bra")}
    # search through the incremental store == direct search on final corpus
    qs = [(1, "replacement"), (2, "table"), (3, "row")]
    a = sorted(map(tuple, cs.search_literal_store(spark, store, final, qs).collect()))
    b = sorted(map(tuple, cs.search_literal(final, qs).collect()))
    assert a == b

    # a second delta deletes the replacement doc again (tombstone at a
    # later seq must mask the seq-1 delta segment)
    cs.update_trigram_store(
        spark.createDataFrame([], "doc_id long, text string"), store, deleted_ids=[1]
    )
    assert postings(store) == postings(want_store) - {
        (d, g) for d, g in postings(want_store) if d == 1
    }

    cs.compact_trigram_store(spark, store)
    import json as _json, os as _os

    meta = _json.load(open(_os.path.join(store, "_trigram_meta.json")))
    assert meta["delta_seq"] == 0 and meta.get("tombstones", {}) == {}
    assert not _os.path.isdir(_os.path.join(store, "_deltas"))
    assert not _os.path.isdir(_os.path.join(store, "_tombstones"))
    assert postings(store) == postings(want_store) - {
        (d, g) for d, g in postings(want_store) if d == 1
    }


def test_trigram_update_never_materializes_delta_ids(spark, tmp_path, monkeypatch):
    """The tombstone set of an epoch lives in the parquet side table, not
    driver memory: update_trigram_store on a large delta must not call
    any driver-materializing DataFrame method (a 100 TB store replaces
    millions of docs per epoch — O(delta) driver memory would choke).
    Results still match a fresh rebuild, before and after compaction."""
    import pyspark.sql.classic.dataframe as _cdf

    store = str(tmp_path / "tg_big")
    base = spark.createDataFrame(DOCS, "doc_id long, text string")
    cs.write_trigram_store(base, store, n_buckets=8)

    delta = spark.range(100, 400).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("delta body number "), F.col("id").cast("string")).alias("text"),
    )

    def _boom(self, *a, **k):  # noqa: ANN001
        raise AssertionError("driver materialization inside update_trigram_store")

    for name in ("collect", "toPandas", "toLocalIterator", "take", "head"):
        monkeypatch.setattr(_cdf.DataFrame, name, _boom)
    cs.update_trigram_store(delta, store, deleted_ids=[3])
    monkeypatch.undo()

    final_rows = [(d, t) for d, t in DOCS if d != 3] + [
        (i, f"delta body number {i}") for i in range(100, 400)
    ]
    final = spark.createDataFrame(final_rows, "doc_id long, text string")
    want_store = str(tmp_path / "tg_big_rebuild")
    cs.write_trigram_store(final, want_store, n_buckets=8)

    def postings(path):
        return {
            (r.doc_id, r.gram)
            for r in cs.load_trigram_postings(spark, path).collect()
        }

    want = postings(want_store)
    assert postings(store) == want
    cs.compact_trigram_store(spark, store)
    assert postings(store) == want


def test_trigram_legacy_meta_tombstones_still_read(spark, tmp_path):
    """A format-1 store (tombstone id lists in the meta JSON, as written
    before the parquet side table) masks segments identically."""
    import json as _json, os as _os

    store = str(tmp_path / "tg_legacy")
    base = spark.createDataFrame(DOCS, "doc_id long, text string")
    cs.write_trigram_store(base, store, n_buckets=8)
    meta_path = _os.path.join(store, "_trigram_meta.json")
    meta = _json.load(open(meta_path))
    meta["format"] = 1
    meta["delta_seq"] = 1
    meta["tombstones"] = {"1": [3]}
    _json.dump(meta, open(meta_path, "w"))
    got_ids = {
        r.doc_id for r in cs.load_trigram_postings(spark, store).collect()
    }
    # docs 5 ("x") and 8 ("") are shorter than a trigram -> no postings
    assert 3 not in got_ids
    assert got_ids == {d for d, t in DOCS if d != 3 and len(t) >= 3}


def test_trigram_stream_ingest(spark, tmp_path):
    """availableNow streaming maintenance == fresh rebuild after every
    drain; the checkpoint makes the second drain consume only new files."""
    from tiny_search_engine_spark.streaming.trigram_stream import (
        trigram_ingest_available_now,
    )

    store = str(tmp_path / "tg")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ck")
    base = spark.createDataFrame(DOCS, "doc_id long, text string")
    cs.write_trigram_store(base, store, n_buckets=8)

    b1 = spark.createDataFrame(
        [(20, "streamed new doc", False),
         (1, "replaced via stream", False),
         (2, None, True)],  # delete doc 2
        "doc_id long, text string, deleted boolean",
    )
    b1.write.parquet(src)  # first file set
    assert trigram_ingest_available_now(spark, src, store, ckpt) >= 1

    def rebuild(rows):
        want = str(tmp_path / f"want{len(rows)}")
        cs.write_trigram_store(
            spark.createDataFrame(rows, "doc_id long, text string"), want, n_buckets=8
        )
        return {
            (r.doc_id, r.gram)
            for r in cs.load_trigram_postings(spark, want).collect()
        }

    def got():
        return {
            (r.doc_id, r.gram)
            for r in cs.load_trigram_postings(spark, store).collect()
        }

    state1 = [(d, t) for d, t in DOCS if d not in (1, 2)] + [
        (20, "streamed new doc"),
        (1, "replaced via stream"),
    ]
    assert got() == rebuild(state1)

    # second drain: only the new file is consumed
    spark.createDataFrame(
        [(21, "second wave", False)], "doc_id long, text string, deleted boolean"
    ).write.mode("append").parquet(src)
    assert trigram_ingest_available_now(spark, src, store, ckpt) >= 1
    assert got() == rebuild(state1 + [(21, "second wave")])


def test_trigram_stream_kill_between_write_and_commit(spark, tmp_path):
    """Exactly-once under FAILURE, not just replay: simulate a drain that
    wrote its epoch's delta segment + tombstone slot and died BEFORE the
    checkpoint commit. The restarted drain replays the same batch id →
    the same seq → update_trigram_store's idempotent-seq contract
    overwrites both, so the store equals a fresh rebuild of the final
    corpus with no ghost postings from the crashed attempt."""
    from tiny_search_engine_spark.streaming.trigram_stream import (
        trigram_ingest_available_now,
    )

    store = str(tmp_path / "tgk")
    src = str(tmp_path / "tgk_src")
    ckpt = str(tmp_path / "tgk_ck")
    base = spark.createDataFrame(DOCS, "doc_id long, text string")
    cs.write_trigram_store(base, store, n_buckets=8)

    spark.createDataFrame(
        [(20, "streamed new doc", False)], "doc_id long, text string, deleted boolean"
    ).write.parquet(src)
    assert trigram_ingest_available_now(spark, src, store, ckpt) == 1

    # the crashed attempt: batch 1's files landed in the inbox AND its
    # half-state is on disk — a seq=2 delta with WRONG content (a ghost
    # doc) plus seq=2 tombstones — but the checkpoint never committed
    spark.createDataFrame(
        [(21, "second wave", False), (1, "replaced via stream", False)],
        "doc_id long, text string, deleted boolean",
    ).write.mode("append").parquet(src)
    ghost = spark.createDataFrame(
        [(777, "ghost postings from the crashed attempt")],
        "doc_id long, text string",
    )
    cs.update_trigram_store(ghost, store, deleted_ids=[4], seq=2)
    assert 777 in {
        r.doc_id for r in cs.load_trigram_postings(spark, store).collect()
    }

    # restart: the same batch replays into seq=2, overwriting the ghost
    # delta and the bogus tombstone slot byte-identically
    assert trigram_ingest_available_now(spark, src, store, ckpt) == 1
    got = {
        (r.doc_id, r.gram)
        for r in cs.load_trigram_postings(spark, store).collect()
    }
    final_rows = [(d, t) for d, t in DOCS if d != 1] + [
        (20, "streamed new doc"),
        (21, "second wave"),
        (1, "replaced via stream"),
    ]
    want_store = str(tmp_path / "tgk_want")
    cs.write_trigram_store(
        spark.createDataFrame(final_rows, "doc_id long, text string"),
        want_store,
        n_buckets=8,
    )
    want = {
        (r.doc_id, r.gram)
        for r in cs.load_trigram_postings(spark, want_store).collect()
    }
    assert got == want
    assert 777 not in {d for d, _ in got}  # ghost postings gone
    assert (4, "aaa") in got  # the crashed attempt's bogus tombstone gone too


def test_grep_cli_in_process(spark, tmp_path, capsys):
    """jobs.py `grep` subcommand: store build + literal and regex search
    over an input_hint-shaped parquet source, doc ids = build.with_doc_id
    natural-key signs."""
    from tiny_search_engine_spark.build import with_doc_id
    from tiny_search_engine_spark.jobs import main
    from tiny_search_engine_spark.synth import source_files

    src = source_files(spark, 60, seed=3)
    pq = str(tmp_path / "src.parquet")
    src.write.parquet(pq)
    qf = tmp_path / "q.tsv"
    qf.write_text("1\tdef \n2\tzzqx\n", encoding="utf-8")
    out = str(tmp_path / "hits.parquet")
    store = str(tmp_path / "tg")

    rc = main(["grep", "--source", pq, "--queries", str(qf),
               "--trigram-store", store, "--build-store", "--buckets", "8",
               "--out", out])
    assert rc == 0
    got = sorted(
        (r.query_id, r.doc_id, r.n_occurrences)
        for r in spark.read.parquet(out).collect()
    )
    docs_df = with_doc_id(src).select("doc_id", F.col("content").alias("text"))
    want = sorted(
        map(tuple, cs.search_literal(docs_df, [(1, "def "), (2, "zzqx")]).collect())
    )
    assert got == want and got

    # --snippets attaches context windows through the CLI
    out2 = str(tmp_path / "snips.parquet")
    rc = main(["grep", "--source", pq, "--queries", str(qf),
               "--trigram-store", store, "--snippets", "6", "--out", out2])
    assert rc == 0
    snips = spark.read.parquet(out2)
    assert set(snips.columns) == {"query_id", "doc_id", "pos", "snippet"}
    assert snips.count() == len(got)
    assert all("def " in r.snippet for r in snips.filter("query_id = 1").collect())

    # regex path against the persisted store, stdout sink
    rf = tmp_path / "r.tsv"
    rf.write_text("1\tdef [a-z_]+\n", encoding="utf-8")
    rc = main(["grep", "--source", pq, "--queries", str(rf), "--regex",
               "--trigram-store", store])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    want_re = {
        (r.query_id, r.doc_id)
        for r in cs.search_regex(docs_df, [(1, "def [a-z_]+")]).collect()
    }
    assert {(int(a), int(b)) for a, b in (l.split("\t") for l in lines)} == want_re
    assert want_re


def test_with_snippets(spark, docs):
    qs = [(1, "make_table"), (2, "aa")]
    hits = cs.search_literal(docs, qs)
    out = {
        (r.query_id, r.doc_id): (r.pos, r.snippet)
        for r in cs.with_snippets(docs, hits, qs, window=5).collect()
    }
    for (qid, did), (pos, snip) in out.items():
        text = dict(DOCS)[did]
        needle = dict(qs)[qid]
        assert pos == text.find(needle) + 1  # 1-based first occurrence
        start = max(0, pos - 1 - 5)
        assert snip == text[start : start + len(needle) + 10]
        assert needle in snip
    # doc 1 "def make_table(..." → match at pos 5, start clips to 1
    assert out[(1, 1)][0] == 5
    # doc 4 "aaaa" → snippet is the whole short doc
    assert out[(2, 4)] == (1, "aaaa")


def test_symbol_xref_brute(spark):
    import re

    rows = [
        (1, "def alpha(): pass"),
        (2, "alpha alpha beta"),        # refs alpha twice
        (3, "def beta(): alpha"),       # defines beta, refs alpha once
        (4, "def hot(): x"),            # "hot" defined everywhere below
        (5, "def hot(): y"),
        (6, "def hot(): z"),
        (7, "hot hot hot"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pat = r"def ([a-z]+)"
    got = sorted(
        (r.symbol, r.def_doc_id, r.ref_doc_id, r.n_refs)
        for r in cs.symbol_xref(df, pat, max_def_docs=2).collect()
    )
    # brute with the same cap
    defs = {}
    for d, t in rows:
        for s in set(re.findall(pat, t)):
            defs.setdefault(s, set()).add(d)
    want = []
    for s, dds in defs.items():
        if len(dds) > 2:
            continue  # hot-symbol cap: "hot" (3 def docs) must vanish
        for dd in dds:
            for rd, t in rows:
                if rd == dd:
                    continue
                n = t.split().count(s)
                if n:
                    want.append((s, dd, rd, n))
    assert got == sorted(want) and got
    assert not [g for g in got if g[0] == "hot"]


def test_prune_path_actually_prunes(spark, docs):
    """The verify join's doc side must be the candidate slice, not the
    corpus: with a needle whose rarest gram hits one doc, the pruned plan
    reads postings + 1 candidate, which we can at least pin behaviorally —
    an absent-gram needle yields zero candidates and zero verify rows."""
    got = cs.search_literal(docs, [(0, "qqqzzz")]).collect()
    assert got == []
