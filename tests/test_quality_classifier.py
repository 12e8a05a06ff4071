"""Round-13 verdict task 4: the learned quality scorer (hashed-gram NB
log-odds, the fastText-supervised shape) must actually SEPARATE quality —
a known-good document outscores a known-bad one, including on held-out
documents the training pass never saw. The cross-engine float contract is
covered by the oracle sweep (quality_classifier_score is value-hashed at
sf0.001/0.01/0.1); this file pins the classifier semantics."""

from pyspark.sql import functions as F

from temporalvault_spark.operators.corpus import (
    QC_BUCKETS,
    gopher_quality,
    quality_classifier_score,
    quality_classifier_weights,
)

# 40 distinct ~5-char tokens: n_tokens=40 (>= 30), mean_tok_len ~5,
# top_tok_frac 1/40 — passes every Gopher rule
_GOOD_VOCAB = [f"word{i:02d}" for i in range(36)]


def _good_text(seed: int) -> str:
    # rotate the shared vocabulary so good docs overlap in grams without
    # being duplicates; deterministic (no RNG — oracle-parity house rule)
    toks = _GOOD_VOCAB[seed % 36 :] + _GOOD_VOCAB[: seed % 36]
    return " ".join(toks + [f"extra{seed:02d}", "fine", "prose", "here"])


def _bad_text(seed: int) -> str:
    # 40 copies of one token: top_tok_frac = 1.0 -> Gopher reject
    return " ".join([f"spam{seed % 4}"] * 40)


def _mk_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def test_labels_split_as_designed(spark):
    docs = _mk_docs(spark, [_good_text(i) for i in range(8)] + [_bad_text(i) for i in range(8)])
    lab = {r["doc_id"]: r["keep"] for r in gopher_quality(docs).collect()}
    assert all(lab[i] for i in range(8))
    assert not any(lab[i] for i in range(8, 16))


def test_good_doc_outscores_bad_held_out(spark):
    train = _mk_docs(
        spark,
        [_good_text(i) for i in range(20)] + [_bad_text(i) for i in range(20)],
    )
    weights = quality_classifier_weights(train)
    assert len(weights) == QC_BUCKETS

    # held-out: a fresh good-vocab doc and a fresh spam doc, NOT in training
    held = spark.createDataFrame(
        [(1000, _good_text(29)), (1001, _bad_text(3))],
        "doc_id bigint, text string",
    )
    scores = {
        r["doc_id"]: r["score"]
        for r in quality_classifier_score(held, weights).collect()
    }
    assert scores[1000] > scores[1001] + 0.5, scores

    # and in-sample: every good doc outscores every bad doc
    s = quality_classifier_score(train, weights)
    worst_good = s.filter(F.col("doc_id") < 20).agg(F.min("score")).first()[0]
    best_bad = s.filter(F.col("doc_id") >= 20).agg(F.max("score")).first()[0]
    assert worst_good > best_bad, (worst_good, best_bad)


def test_score_is_length_normalized(spark):
    """Doubling a document's text (same gram distribution, ~2x the grams)
    must not double its score — the scorer is a MEAN over grams, so rank
    can't be dominated by length (the fastText mean-pooling property)."""
    train = _mk_docs(
        spark,
        [_good_text(i) for i in range(12)] + [_bad_text(i) for i in range(12)],
    )
    weights = quality_classifier_weights(train)
    one = _good_text(5)
    pair = spark.createDataFrame(
        [(1, one), (2, one + " " + one)], "doc_id bigint, text string"
    )
    got = {r["doc_id"]: r for r in quality_classifier_score(pair, weights).collect()}
    assert got[2]["n_grams"] > 1.9 * got[1]["n_grams"]
    assert abs(got[2]["score"] - got[1]["score"]) < 0.3 * abs(got[1]["score"]) + 0.05
