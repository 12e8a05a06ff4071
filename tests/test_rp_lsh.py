"""Random-hyperplane LSH: recall on crafted duplicates, sign semantics,
signature shape, and strict-filter robustness."""

import pytest

from temporalvault_spark.operators.rp_lsh import (
    RP_BANDS,
    RP_BITS,
    rp_lsh_pairs,
    rp_signatures,
)


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")


@pytest.fixture()
def base_vec():
    # a fixed 8-dim direction; values chosen so no plane dot lands near 0
    return [0.9, -0.3, 0.5, 0.1, -0.7, 0.2, 0.4, -0.6]


def test_scaled_duplicate_always_collides(spark, base_vec):
    """A positively-scaled copy has identical signs on every plane dot →
    identical signature in every band → found with cosine 1.0."""
    rows = [(1, base_vec, 0), (2, [2.0 * x for x in base_vec], 0)]
    got = rp_lsh_pairs(_emb(spark, rows)).collect()
    assert len(got) == 1
    assert (got[0]["vec_a"], got[0]["vec_b"]) == (1, 2)
    assert got[0]["cosine"] == pytest.approx(1.0, abs=1e-6)


def test_opposite_vector_never_collides(spark, base_vec):
    """-v flips every signature bit → different bucket in every band."""
    rows = [(1, base_vec, 0), (2, [-x for x in base_vec], 0)]
    assert rp_lsh_pairs(_emb(spark, rows)).count() == 0


def test_signature_shape(spark, base_vec):
    rows = [(1, base_vec, 0), (2, [2.0 * x for x in base_vec], 0)]
    sigs = rp_signatures(_emb(spark, rows)).collect()
    assert len(sigs) == 2 * RP_BANDS
    assert all(len(r["bucket"]) == RP_BITS for r in sigs)
    assert all(set(r["bucket"]) <= {"0", "1"} for r in sigs)
    # scaled copies share every band bucket
    by_band = {}
    for r in sigs:
        by_band.setdefault(r["band"], set()).add(r["bucket"])
    assert all(len(v) == 1 for v in by_band.values())


def test_null_and_zero_vectors_excluded(spark, base_vec):
    rows = [(1, base_vec, 0), (2, None, 0), (3, [0.0] * 8, 0)]
    sigs = rp_signatures(_emb(spark, rows))
    assert {r["vec_id"] for r in sigs.collect()} == {1}
    assert rp_lsh_pairs(_emb(spark, rows)).count() == 0
