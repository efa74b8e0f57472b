"""Training-shard writer: brute-force parity of the full chunk table,
chunk-length tiling, decode round-trip, write determinism, and the BPE
composition path."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from tiny_search_engine_spark.pipeline import bpe, shards


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the quick brown fox"),
        (2, "jumps over the lazy dog the end"),
        (3, ""),                      # dropped: zero tokens
        (5, "quick quick brown"),
        (7, " ".join(["pad"] * 19)),  # spans multiple chunks at len 8
        (9, "tail"),
    ]
    return rows, spark.createDataFrame(rows, "doc_id long, text string")


def _brute_chunks(rows, chunk_len):
    toks = {i: t.lower().split() for i, t in sorted(rows) if t.split()}
    df_counts = Counter(w for ws in toks.values() for w in ws)
    vocab = {
        w: i
        for i, w in enumerate(sorted(df_counts, key=lambda w: (-df_counts[w], w)))
    }
    stream = [vocab[w] for i in sorted(toks) for w in toks[i]]
    return {
        c: stream[c * chunk_len : (c + 1) * chunk_len]
        for c in range((len(stream) + chunk_len - 1) // chunk_len)
    }, vocab, toks


def test_chunks_match_brute(corpus):
    rows, df = corpus
    want, _, _ = _brute_chunks(rows, 8)
    got = {
        r["chunk_id"]: list(r["token_ids"])
        for r in shards.build_chunks(df, tokenizer="ws", chunk_len=8).collect()
    }
    assert got == want


def test_chunks_tile_and_decode_roundtrip(corpus):
    rows, df = corpus
    out = shards.build_chunks(df, tokenizer="ws", chunk_len=8).collect()
    n_total = sum(len(t.lower().split()) for _, t in rows)
    sizes = {r["chunk_id"]: r["n_tokens"] for r in out}
    last = max(sizes)
    assert all(s == 8 for c, s in sizes.items() if c != last)
    assert sum(sizes.values()) == n_total
    # decode: inverse vocab over the concatenated stream == original tokens
    _, vocab, toks = _brute_chunks(rows, 8)
    inv = {i: w for w, i in vocab.items()}
    stream = [
        inv[t] for r in sorted(out, key=lambda r: r["chunk_id"]) for t in r["token_ids"]
    ]
    assert stream == [w for i in sorted(toks) for w in toks[i]]


def test_supplied_vocab_and_oov(corpus, spark):
    rows, df = corpus
    vocab = spark.createDataFrame(
        [("the", 0), ("quick", 1)], "term string, token_id long"
    )
    out = shards.build_chunks(df, tokenizer="ws", chunk_len=8, vocab=vocab, oov_id=-1)
    ids = [t for r in out.collect() for t in r["token_ids"]]
    assert set(ids) == {0, 1, -1}
    assert ids.count(0) == 3  # 'the' appears 3x in the corpus


def test_write_shards_partitioned_and_deterministic(corpus, tmp_path):
    rows, df = corpus
    s1 = shards.write_training_shards(
        df, str(tmp_path / "a"), tokenizer="ws", chunk_len=8, chunks_per_shard=2
    )
    s2 = shards.write_training_shards(
        df, str(tmp_path / "b"), tokenizer="ws", chunk_len=8, chunks_per_shard=2
    )
    assert s1["n_chunks"] == s2["n_chunks"] > 1
    assert s1["n_shards"] == -(-s1["n_chunks"] // 2)
    assert s1["n_full_chunks"] == s1["n_chunks"] - 1
    spark = df.sparkSession
    a = sorted(
        (r["chunk_id"], list(r["token_ids"]))
        for r in spark.read.parquet(str(tmp_path / "a")).collect()
    )
    b = sorted(
        (r["chunk_id"], list(r["token_ids"]))
        for r in spark.read.parquet(str(tmp_path / "b")).collect()
    )
    assert a == b
    # shard partitioning actually present on disk
    import os

    assert any(d.startswith("shard_id=") for d in os.listdir(tmp_path / "a"))


def test_bpe_tokenizer_composition(corpus, spark):
    """End-to-end: learn a BPE vocab from the corpus, register it, and
    shard the corpus with subword ids — the full pretraining-prep path."""
    from tiny_search_engine_spark.tokenizer import register_tokenizer

    rows, df = corpus
    merges = bpe.learn_bpe(df, n_merges=10, min_freq=2)
    register_tokenizer("bpe_shards_test", bpe.BPETokenizer(merges))
    out = shards.build_chunks(df, tokenizer="bpe_shards_test", chunk_len=16).collect()
    sizes = {r["chunk_id"]: r["n_tokens"] for r in out}
    last = max(sizes)
    assert all(s == 16 for c, s in sizes.items() if c != last)
    # subword stream is at least as long as the word stream
    n_words = sum(len(t.split()) for _, t in rows)
    assert sum(sizes.values()) >= n_words


def test_shards_cli_in_process(spark, tmp_path, capsys):
    """jobs.py `shards` subcommand over an input_hint-shaped parquet
    source: code-tokenizer path and the --bpe-merges learn-first path."""
    import json

    from tiny_search_engine_spark.jobs import main
    from tiny_search_engine_spark.synth import source_files

    src = source_files(spark, 40, seed=5)
    pq = str(tmp_path / "src.parquet")
    src.write.parquet(pq)

    out = str(tmp_path / "shards")
    rc = main(["shards", "--source", pq, "--out", out,
               "--chunk-len", "64", "--chunks-per-shard", "4"])
    assert rc == 0
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["n_chunks"] > 0 and s["n_full_chunks"] == s["n_chunks"] - 1
    back = spark.read.parquet(out)
    assert back.filter(F.col("n_tokens") != 64).count() == 1  # only the tail

    out2 = str(tmp_path / "shards_bpe")
    rc = main(["shards", "--source", pq, "--out", out2,
               "--bpe-merges", "8", "--chunk-len", "64"])
    assert rc == 0
    s2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s2["bpe_merges"] == 8 and s2["n_chunks"] > 0


def test_fused_and_join_paths_identical(corpus):
    """broadcast_vocab=True (fused tokenize+id-map, no token shuffle) and
    =False (explode ⋈ vocab join) must produce identical chunk tables."""
    rows, df = corpus
    a = {
        r["chunk_id"]: list(r["token_ids"])
        for r in shards.build_chunks(
            df, tokenizer="ws", chunk_len=8, broadcast_vocab=True
        ).collect()
    }
    b = {
        r["chunk_id"]: list(r["token_ids"])
        for r in shards.build_chunks(
            df, tokenizer="ws", chunk_len=8, broadcast_vocab=False
        ).collect()
    }
    assert a == b
    want, _, _ = _brute_chunks(rows, 8)
    assert a == want


def test_derive_vocab_bounds(corpus, spark):
    """max_vocab / min_freq make the broadcast-dict size bound explicit:
    capped vocab keeps the TOP-ranked ids (df desc, term asc — dense,
    stable prefix of the unbounded ranking), rare terms drop with
    min_freq, and the OOV id absorbs everything cut."""
    import pytest as _pytest

    terms = (
        ["alpha"] * 5 + ["beta"] * 4 + ["gamma"] * 3 + ["delta"] * 2
        + ["eps", "zeta", "eta", "theta", "iota", "kappa", "lam", "mu"]
    )
    toks = spark.createDataFrame([(t,) for t in terms], "term string")
    full = {r["term"]: r["token_id"] for r in shards.derive_vocab(toks).collect()}
    capped = {
        r["term"]: r["token_id"]
        for r in shards.derive_vocab(toks, max_vocab=5).collect()
    }
    assert len(capped) == 5
    # the capped vocab IS the top-5 prefix of the full ranking
    assert capped == {t: i for t, i in full.items() if i < 5}
    mf = {
        r["term"]: r["token_id"]
        for r in shards.derive_vocab(toks, min_freq=3).collect()
    }
    assert set(mf) == {"alpha", "beta", "gamma"}
    assert sorted(mf.values()) == [0, 1, 2]  # ids stay dense after the cut
    with _pytest.raises(ValueError):
        shards.derive_vocab(toks, max_vocab=0)
    with _pytest.raises(ValueError):
        shards.derive_vocab(toks, min_freq=0)
