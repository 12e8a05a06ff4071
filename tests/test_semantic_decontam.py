"""Round-13 verdict task 5: semantic decontamination must catch the leak
class the exact 13-gram scan structurally misses — a PARAPHRASED benchmark
item (zero shared 13-grams, near-parallel embedding). The cross-engine
float contract is covered by the oracle sweep (decontaminate_semantic is
value-hashed at sf0.001/0.01/0.1); this file pins the semantics on a
crafted corpus."""

from pyspark.sql import functions as F

from temporalvault_spark.operators.llm import DECONTAM_NGRAM
from temporalvault_spark.operators.similarity import semantic_contamination

DIM = 8

# benchmark item and its paraphrase: same meaning, every token different —
# so the exact n-gram tier sees NOTHING shared at any n >= 1
_BENCH_TEXT = (
    "the quick brown fox jumps over the lazy dog while cold rain falls on "
    "the quiet village during an early autumn morning"
)
_PARAPHRASE = (
    "a speedy russet vulpine leaps above one idle hound as chilly drizzle "
    "descends upon that silent hamlet throughout some premature fall dawn"
)
_UNRELATED = (
    "quarterly revenue grew eleven percent as shipping margins widened and "
    "the board approved a modest dividend increase for common shareholders"
)


def _grams(text: str, n: int) -> set:
    toks = text.lower().split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_paraphrase_shares_no_ngrams():
    """The crafted pair must sit OUTSIDE the exact tier's reach — no shared
    n-gram at the decontamination width (or any width down to unigrams)."""
    for n in (1, 2, DECONTAM_NGRAM):
        assert not (_grams(_BENCH_TEXT, n) & _grams(_PARAPHRASE, n)), n


def _vec(base: list, eps: float = 0.0) -> list:
    # a copy of `base` with a small orthogonal component mixed in
    out = list(base)
    out[-1] = out[-1] + eps
    return [float(x) for x in out]


def test_semantic_tier_catches_the_paraphrase(spark):
    v = [1.0, 0.4, -0.2, 0.7, 0.1, -0.5, 0.3, 0.0]
    ortho = [0.0, -0.1, 0.5, 0.0, -0.8, 0.2, 0.0, 1.0]
    bench = spark.createDataFrame(
        [(0, _vec(v))], "vec_id bigint, e array<double>"
    )
    corpus = spark.createDataFrame(
        [(100, _vec(v, 0.05)), (101, _vec(ortho))],
        "vec_id bigint, e array<double>",
    )
    cents = spark.createDataFrame(
        [(0, _vec(v)), (1, _vec(ortho))],
        "centroid_id bigint, ce array<double>",
    )
    got = {
        r["vec_id"]: r
        for r in semantic_contamination(
            corpus, bench, cents, threshold=0.9, nprobe=1
        ).collect()
    }
    # the paraphrase (embedding nearly parallel to the benchmark item) is
    # flagged at a production-style threshold; the unrelated doc is not
    assert got[100]["contaminated"] and got[100]["max_cos"] > 0.99
    assert not got[101]["contaminated"]
    assert got[100]["n_bench_hits"] == 1


def test_unprobed_cluster_rows_still_surface(spark):
    """A corpus vector whose cluster no benchmark item probes must still
    appear in the output — max_cos = -1.0 sentinel, not a dropped row (the
    all-rows contract that keeps the oracle row count data-independent)."""
    v = [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    ortho = [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0]
    bench = spark.createDataFrame([(0, _vec(v))], "vec_id bigint, e array<double>")
    corpus = spark.createDataFrame(
        [(100, _vec(ortho))], "vec_id bigint, e array<double>"
    )
    cents = spark.createDataFrame(
        [(0, _vec(v)), (1, _vec(ortho))], "centroid_id bigint, ce array<double>"
    )
    rows = semantic_contamination(corpus, bench, cents, nprobe=1).collect()
    assert len(rows) == 1
    assert rows[0]["max_cos"] == -1.0
    assert rows[0]["n_bench_hits"] == 0
    assert not rows[0]["contaminated"]
