"""Quality tests for the hash-based dedup/similarity operators (the
ones whose engine-specific hashes preclude a SQL oracle): LSH recall
is measured against the exact methods on the same corpus."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from online_anomaly_detection_root_cause_analysis_spark.operators.dedup import (
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from online_anomaly_detection_root_cause_analysis_spark.operators.multimodal import (
    decode_image_batch,
    extract_media_features,
    frame_sample_plan,
    make_fake_media,
)
from online_anomaly_detection_root_cause_analysis_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    return entry_mod._doc_corpus(spark, SF_DIR).cache()


def test_minhash_lsh_recall_vs_exact(spark, corpus):
    exact = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(corpus, n=3, threshold=0.5).collect()
    }
    assert exact, "corpus should contain planted near-dups"
    lsh = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(corpus, n=3, num_hashes=64, bands=16).collect()
    }
    recall = len(exact & lsh) / len(exact)
    # 16 bands x 4 rows: P(candidate | j=0.5) = 1-(1-0.5^4)^16 ~ 0.64;
    # planted near-dups have j >> 0.5 so recall should be high
    assert recall >= 0.9, f"LSH recall {recall:.2f} over {len(exact)} exact pairs"


def test_minhash_estimate_close_to_exact(spark, corpus):
    exact = ngram_jaccard_pairs(corpus, n=3, threshold=0.5).select(
        "doc_a", "doc_b", "jaccard"
    )
    est = minhash_lsh_pairs(corpus, n=3, num_hashes=64, bands=16)
    joined = exact.join(est, ["doc_a", "doc_b"]).select(
        F.avg(F.abs(F.col("jaccard") - F.col("est_jaccard"))).alias("mae")
    )
    mae = joined.first().mae
    assert mae is not None and mae < 0.15, f"minhash MAE {mae}"


def test_simhash_finds_exact_dups(spark, corpus):
    # exact duplicates have identical simhash -> hamming 0 pairs
    exact = {
        tuple(sorted((r.doc_id, r.group_min_id)))
        for r in exact_duplicates(corpus).collect()
        if r.doc_id != r.group_min_id
    }
    assert exact
    sh = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_pairs(corpus, max_hamming=3).collect()
    }
    found = sum(1 for pair in exact if pair in sh and sh[pair] == 0)
    assert found == len(exact)


def test_lsh_topk_recall_vs_brute_force(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    brute = brute_force_topk(emb, queries, k=10).collect()
    ann = lsh_topk(emb, queries, k=10, bits=6, tables=8, multiprobe=2).collect()
    brute_set = {(r.query_id, r.vec_id) for r in brute}
    ann_set = {(r.query_id, r.vec_id) for r in ann}
    recall = len(brute_set & ann_set) / len(brute_set)
    # 8 tables x 6 bits + 2 probes on 64-dim near-orthogonal noise:
    # weak top-10 cosines (~0.4) are the hard case for hyperplane LSH
    assert recall >= 0.5, f"ANN recall {recall:.2f}"
    # self-match sanity: every query's top hit is itself at cosine 1
    top = {r.query_id: r.vec_id for r in brute if r.rank == 1}
    assert all(q == v for q, v in top.items())


def test_multimodal_plumbing(spark):
    media = make_fake_media(spark, n=120)
    feats = extract_media_features(media, fake_decode=True)
    rows = feats.collect()
    assert len(rows) == 120
    for r in rows[:10]:
        assert r.width * r.height <= r.n_bytes
        assert 0 <= r.mean_byte <= 255
        assert len(r.payload_sha) == 64
    # the real-decoder path is stubbed
    import pandas as pd

    with pytest.raises(NotImplementedError):
        decode_image_batch(pd.Series([b"xx"]), fake=False)
    # frame sampling plan explodes deterministically
    plan = frame_sample_plan(media, every_n=10)
    assert plan.filter(F.col("frame_idx") % 10 != 0).count() == 0
    assert plan.count() > 0
