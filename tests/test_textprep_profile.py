"""Tests for chunking, BM25 scoring, and single-pass profiling."""

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_pipeline_spark.operators.profile import profile
from etl_pipeline_spark.operators.textprep import bm25_scores, chunk_tokens


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def test_chunks_cover_and_reconstruct(spark):
    text = " ".join(f"w{i}" for i in range(47))
    out = chunk_tokens(_docs(spark, [text]), chunk_size=20, stride=15).collect()
    # starts at 1, 16, 31, 46 → 4 chunks; last has 2 tokens
    assert [r.chunk_id for r in out] == [0, 1, 2, 3]
    assert [r.n_tokens for r in out] == [20, 20, 17, 2]
    assert out[0].chunk_text.split(" ") == [f"w{i}" for i in range(20)]
    assert out[3].chunk_text == "w45 w46"
    # consecutive chunks overlap by chunk-stride tokens
    assert out[0].chunk_text.split(" ")[15:] == out[1].chunk_text.split(" ")[:5]


def test_chunks_nonoverlapping_reconstruct_exactly(spark):
    text = " ".join(f"t{i}" for i in range(33))
    out = chunk_tokens(_docs(spark, [text]), chunk_size=10, stride=10).collect()
    rebuilt = " ".join(r.chunk_text for r in sorted(out, key=lambda r: r.chunk_id))
    assert rebuilt == text


def test_chunking_is_narrow(spark):
    plan = (
        chunk_tokens(_docs(spark, ["a b c"]), chunk_size=2, stride=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_bm25_matches_hand_computation(spark):
    texts = ["cat dog cat", "dog bird", "fish fish fish cat"]
    out = {
        r.doc_id: r.score
        for r in bm25_scores(_docs(spark, texts), ["cat"], k1=1.2, b=0.75).collect()
    }
    # cat: df=2, N=3 → idf = ln((3-2+0.5)/(2+0.5)+1); dl = 3,2,4; avgdl = 3
    idf = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1)

    def w(tf, dl):
        return idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / 3.0))

    assert set(out) == {0, 2}  # doc 1 has no 'cat'
    assert abs(out[0] - w(2, 3)) < 1e-12
    assert abs(out[2] - w(1, 4)) < 1e-12


def test_profile_values_and_single_scan(spark, tmp_path):
    df = spark.createDataFrame(
        [
            Row(k=1, name="ab", val=2.5),
            Row(k=2, name=None, val=-1.0),
            Row(k=2, name="wxyz", val=None),
        ]
    )
    path = str(tmp_path / "p")
    df.write.parquet(path)
    stats = {r.col_name: r for r in profile(spark.read.parquet(path)).collect()}
    assert stats["k"].n_nulls == 0 and stats["k"].n_distinct == 2
    assert stats["k"].min_num == 1.0 and stats["k"].max_num == 2.0
    assert stats["name"].n_nulls == 1 and stats["name"].n_distinct == 2
    assert stats["name"].min_len == 2.0 and stats["name"].max_len == 4.0
    assert stats["name"].min_num is None
    assert stats["val"].n_nulls == 1 and stats["val"].min_num == -1.0
    plan = (
        profile(spark.read.parquet(path))._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan parquet") == 1


def test_eval_contamination_planted_copy(spark):
    from etl_pipeline_spark.operators.textprep import eval_contamination

    texts = [
        "alpha beta gamma delta epsilon zeta",   # doc 0 (eval: 0 % 3 == 0)
        "alpha beta gamma delta epsilon zeta",   # doc 1 — exact copy of eval doc 0
        "one two three four five six seven",     # doc 2 — disjoint
        "unrelated words entirely different here now",  # doc 3 (eval)
    ]
    out = eval_contamination(
        _docs(spark, texts), F.col("doc_id") % 3 == 0, min_common=2
    ).collect()
    rows = {(r.train_doc, r.eval_doc): r for r in out}
    # the exact copy shares all 4 shingles of the 6-token eval doc
    assert set(rows) == {(1, 0)}
    assert rows[(1, 0)].n_common == 4
    assert rows[(1, 0)].contamination == 1.0


def test_repetition_metrics_hand_values(spark):
    from etl_pipeline_spark.operators.textprep import repetition_metrics

    out = {r.doc_id: r for r in repetition_metrics(_docs(spark, ["a a a b", "x y"])).collect()}
    r0 = out[0]
    assert r0.n_tokens == 4
    assert r0.top_token_frac == 0.75          # 'a' ×3 / 4
    assert r0.top_bigram_frac == 1.0          # 'a a' ×2 → 2*2/4
    assert r0.distinct_ratio == 0.5           # {a, b} / 4
    r1 = out[1]
    assert r1.top_token_frac == 0.5 and r1.top_bigram_frac == 1.0
    assert r1.distinct_ratio == 1.0


def test_repetition_metrics_fuzz_vs_python(spark):
    """Seeded random corpora: the Spark plan must agree with a direct
    Python computation of every metric (one job for all examples)."""
    import random
    from collections import Counter

    from etl_pipeline_spark.operators.textprep import repetition_metrics

    rng = random.Random(20260813)
    vocab = ["a", "bb", "ccc", "d", "e"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 30)))
        for _ in range(60)
    ]
    out = {r.doc_id: r for r in repetition_metrics(_docs(spark, texts)).collect()}
    assert len(out) == 60
    for i, text in enumerate(texts):
        toks = text.split(" ")
        bigrams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        r = out[i]
        assert r.n_tokens == len(toks)
        assert r.top_token_frac == round(max(Counter(toks).values()) / len(toks), 6)
        assert r.top_bigram_frac == round(2.0 * max(Counter(bigrams).values()) / len(toks), 6)
        assert r.distinct_ratio == round(len(set(toks)) / len(toks), 6)
