"""End-to-end training-corpus funnel (plans/training_data.py)."""

import os

from pyspark.sql import functions as F

from news_rss_spark.plans.training_data import (
    build_training_corpus,
    run_training_corpus_job,
)

# 10 words no regular doc contains: only doc 104 shares 8-grams with bench
SNIPPET = ("zulu yankee xray whiskey victor uniform tango sierra "
           "quebec papa")


def _text(i):
    # 20 per-doc-unique alphabetic words: docs share only the tiny
    # frame, so cross-doc Jaccard stays far below any dedup threshold
    a, b = chr(97 + i // 26), chr(97 + i % 26)
    body = " ".join(f"w{a}{b}{chr(103 + j)}x" for j in range(20))
    return f"the quick {body} and that is the end of story"


def _docs(spark):
    rows = [(i, _text(i), f"src{i % 4}") for i in range(40)]
    rows.append((100, _text(0), "src0"))                     # exact dup of 0
    near = _text(1).replace("wabzx", "wabzy")                # 1 word changed
    rows.append((101, near, "src1"))                         # near dup of 1
    rows.append((102, "!!! ??? ### 123 456", "src2"))        # junk quality
    rows.append((103, None, "src3"))                         # null text
    rows.append((104, _text(45) + " " + SNIPPET, "src0"))    # contaminated
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


def _bench(spark):
    return spark.createDataFrame(
        [(0, "held out benchmark question about " + SNIPPET)],
        ["doc_id", "text"])


def test_funnel_monotone_and_stage_semantics(spark):
    corpus, f = build_training_corpus(
        _docs(spark), bench=_bench(spark), jaccard_threshold=0.7,
        shard_token_budget=200)
    assert f.n_input == 44                     # null text dropped up front
    assert f.n_input >= f.n_quality >= f.n_exact >= f.n_fuzzy >= f.n_clean
    assert f.n_quality == 43                   # junk doc fails quality
    assert f.n_exact == 42                     # exact dup of doc 0 collapsed
    assert f.n_fuzzy == 41                     # near dup of doc 1 collapsed
    rows = corpus.collect()
    ids = {r["doc_id"] for r in rows}
    assert 100 not in ids and 102 not in ids and 103 not in ids
    assert 104 not in ids                      # decontaminated
    assert 0 in ids and 1 in ids               # keepers are the min ids
    assert f.n_clean == len(rows)
    assert sum(f.split_docs.values()) == f.n_clean


def test_packing_respects_budget_and_split_isolation(spark):
    corpus, f = build_training_corpus(_docs(spark), shard_token_budget=100)
    max_doc = corpus.agg(F.max("n_tokens")).collect()[0][0]
    per_shard = (corpus.groupBy("split", "shard_id")
                 .agg(F.sum("n_tokens").alias("t"),
                      F.min("n_tokens").alias("m")).collect())
    for r in per_shard:
        # greedy prefix packing: a shard exceeds budget by at most one doc
        assert r["t"] < 100 + max_doc, r
    for split in ("train", "val", "test"):
        assert f.split_shards[split] <= max(f.split_docs[split], 1)


def test_job_writes_partitioned_corpus_and_is_deterministic(spark, tmp_path):
    out = str(tmp_path / "corpus")
    f1 = run_training_corpus_job(spark, _docs(spark), out)
    assert os.path.isdir(os.path.join(out, "split=train"))
    back = spark.read.parquet(out)
    assert back.count() == f1.n_clean
    assert {"doc_id", "text", "quality_score", "n_tokens",
            "shard_id"} <= set(back.columns)
    f2 = run_training_corpus_job(spark, _docs(spark), out)
    assert (f1.n_clean, f1.split_docs, f1.split_tokens) == \
           (f2.n_clean, f2.split_docs, f2.split_tokens)


def test_temperature_mix_flattens_sources(spark):
    from news_rss_spark.plans.training_data import build_training_corpus
    # one dominant source, two small ones
    rows = ([(i, "big", "unique text %d alpha beta gamma delta" % i)
             for i in range(300)]
            + [(1000 + i, "s1", "unique text %d epsilon zeta eta" % i)
               for i in range(30)]
            + [(2000 + i, "s2", "unique text %d theta iota kappa" % i)
               for i in range(30)])
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    full, f_full = build_training_corpus(docs, quality_min=0.0)
    mixed, f_mix = build_training_corpus(docs, quality_min=0.0, mix_alpha=0.0)
    by_src = {r["source"]: r["n"] for r in
              mixed.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # alpha=0 equalizes expected counts at the smallest group's size
    assert by_src["big"] < 100
    assert f_mix.n_clean < f_full.n_clean
    # split/pack accounting still holds post-mix
    assert sum(f_mix.split_docs.values()) == f_mix.n_clean


def test_context_windows_cover_each_split_exactly(spark):
    from news_rss_spark.plans.training_data import (
        build_context_windows,
        build_training_corpus,
    )
    rows = [(i, "s", "w%d " % i + "lorem ipsum dolor sit amet " * (i % 7 + 1))
            for i in range(120)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    corpus, f = build_training_corpus(docs, quality_min=0.0)
    corpus = corpus.localCheckpoint(eager=True)
    win = build_context_windows(corpus, chunk_tokens=64)
    got_tokens = {r["split"]: r["t"] for r in
                  win.groupBy("split")
                  .agg(F.sum(F.col("doc_end") - F.col("doc_start")).alias("t"))
                  .collect()}
    # slices tile each split's token axis exactly; windows never straddle
    for split, toks in f.split_tokens.items():
        assert got_tokens.get(split, 0) == toks
    per_win = (win.groupBy("split", "chunk_id")
               .agg(F.sum(F.col("doc_end") - F.col("doc_start")).alias("w"))
               .collect())
    for r in per_win:
        assert r["w"] <= 64


def test_job_writes_window_map(spark, tmp_path):
    from news_rss_spark.plans.training_data import run_training_corpus_job
    rows = [(i, "s", "text %d lorem ipsum dolor sit" % i) for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = str(tmp_path / "corpus")
    f = run_training_corpus_job(spark, docs, out, chunk_tokens=32,
                                quality_min=0.0)
    win = spark.read.parquet(out + "_windows")
    assert win.count() > 0
    assert set(win.columns) == {"split", "chunk_id", "doc_id",
                                "doc_start", "doc_end", "chunk_off"}
    total = win.agg(F.sum(F.col("doc_end") - F.col("doc_start"))).collect()[0][0]
    assert total == sum(f.split_tokens.values())


def test_funnel_dsir_stage_selects_target_like_docs(spark):
    # target = the corpus's src0 docs: DSIR should prefer src0-flavored
    # text... but _text() is per-doc unique, so instead make the target
    # share the docs' common frame and assert the stage keeps exactly k
    target = spark.createDataFrame(
        [(0, "the quick and that is the end of story")], ["doc_id", "text"])
    corpus, f = build_training_corpus(
        _docs(spark), bench=_bench(spark), jaccard_threshold=0.7,
        shard_token_budget=200, dsir_target=target, dsir_keep=10)
    assert f.n_dsir == 10
    assert f.n_clean == 10
    assert len({r["doc_id"] for r in corpus.collect()}) == 10
    # content-stable: same salt -> identical selection
    corpus2, f2 = build_training_corpus(
        _docs(spark), bench=_bench(spark), jaccard_threshold=0.7,
        shard_token_budget=200, dsir_target=target, dsir_keep=10)
    assert ({r["doc_id"] for r in corpus.collect()}
            == {r["doc_id"] for r in corpus2.collect()})


def test_funnel_dsir_keep_larger_than_corpus_is_a_noop(spark):
    target = spark.createDataFrame([(0, "the quick end")],
                                   ["doc_id", "text"])
    _, f = build_training_corpus(
        _docs(spark), bench=_bench(spark), jaccard_threshold=0.7,
        shard_token_budget=200, dsir_target=target, dsir_keep=1000)
    assert f.n_dsir == f.n_clean == 40


def test_funnel_dsir_half_configured_raises(spark):
    import pytest
    with pytest.raises(ValueError, match="dsir_target and dsir_keep"):
        build_training_corpus(_docs(spark), dsir_keep=10)


def test_funnel_dsir_featureless_target_raises(spark):
    import pytest
    empty_target = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="DSIR selected 0"):
        build_training_corpus(_docs(spark), dsir_target=empty_target,
                              dsir_keep=10)
