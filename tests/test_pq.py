"""Product-quantization tier: encode parity vs an independent numpy
replication, reconstruction sanity, and ADC ranking recall on crafted
clusters (the sf testdata is near-uniform, so oracle parity alone cannot
show ADC actually ranks neighbors first)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from temporalvault_spark.operators.pq import (
    PQ_DIM,
    PQ_K,
    PQ_M,
    PQ_SUB,
    pq_adc_topk,
    pq_encode,
)


def _np_codes(vecs: dict[int, np.ndarray]) -> dict[int, list[int]]:
    """Engine-independent PQ encode: codebook = first-PQ_K vectors'
    subvector slices; argmin squared L2 per subspace, ties to lower code
    (np.argmin returns the first minimum = lowest code)."""
    cb = np.stack([vecs[c] for c in range(PQ_K)])  # (K, DIM)
    out = {}
    for vid, v in vecs.items():
        codes = []
        for j in range(PQ_M):
            sl = slice(j * PQ_SUB, (j + 1) * PQ_SUB)
            d = ((cb[:, sl] - v[sl]) ** 2).sum(axis=1)
            codes.append(int(np.argmin(d)))
        out[vid] = codes
    return out


@pytest.fixture(scope="module")
def emb_pdf(sf_dir):
    pdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    pdf = pdf[pdf["embedding"].notna()]
    pdf = pdf[pdf["embedding"].map(len) == PQ_DIM]
    return pdf


def test_pq_encode_matches_numpy_reference(spark, sf_dir, emb_pdf):
    from temporalvault_spark.operators.pq import _pq_emb

    got = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(_pq_emb(spark, sf_dir)).collect()
    }
    vecs = {
        int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
        for r in emb_pdf.itertuples()
    }
    assert got == _np_codes(vecs)


def test_pq_reconstruction_beats_zero_baseline(spark, sf_dir, emb_pdf):
    """Decoding a vector's codes back to codewords must reconstruct better
    than the all-zeros baseline — i.e. the quantizer explains variance.
    (First-K codebooks are a weak quantizer; this is the floor any
    non-broken PQ clears by a wide margin.)"""
    vecs = {
        int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
        for r in emb_pdf.itertuples()
    }
    codes = _np_codes(vecs)
    cb = np.stack([vecs[c] for c in range(PQ_K)])
    sq_err = 0.0
    sq_norm = 0.0
    for vid, v in vecs.items():
        rec = np.concatenate(
            [cb[codes[vid][j], j * PQ_SUB : (j + 1) * PQ_SUB] for j in range(PQ_M)]
        )
        sq_err += float(((v - rec) ** 2).sum())
        sq_norm += float((v**2).sum())
    assert sq_err < 0.8 * sq_norm


def test_pq_adc_ranks_crafted_clusters(spark):
    """Two tight clusters seeded on distinct codewords: an ADC probe from
    cluster A must rank every A member above every B member (PQ quantizes
    A members exactly onto A's codes, so their table distance is minimal)."""
    rng = [0.01 * (i + 1) for i in range(5)]

    def pattern(axis: int, eps: float = 0.0) -> list[float]:
        # axis one-hot repeated in every subspace, plus a small off-axis bump
        v = [0.0] * PQ_DIM
        for j in range(PQ_M):
            v[j * PQ_SUB + axis] = 1.0
            v[j * PQ_SUB + (axis + 1) % PQ_SUB] = eps
        return v

    rows = [(c, pattern(c % PQ_SUB), 0) for c in range(PQ_K)]  # codebook
    rows += [(100 + i, pattern(2, rng[i]), 1) for i in range(5)]  # cluster A
    rows += [(200 + i, pattern(5, rng[i]), 2) for i in range(5)]  # cluster B
    e = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int"
    ).select("vec_id", "label", F.col("embedding").alias("e"))
    probe = e.filter(F.col("vec_id") == 100)
    top = pq_adc_topk(e, probe, k=26).collect()
    ranked = [r["vec_id"] for r in top]
    a_ranks = [ranked.index(100 + i) for i in range(5)]
    b_ranks = [ranked.index(200 + i) for i in range(5)]
    assert max(a_ranks) < min(b_ranks)
    # A members quantize onto codeword 2's codes exactly -> ADC distance
    # equals the probe's own table distance for those codes
    adc = {r["vec_id"]: r["adc_dist"] for r in top}
    assert all(adc[100 + i] == adc[100] for i in range(5))


def test_pq_trained_codebooks_beat_first_k(spark, sf_dir, emb_pdf):
    """Per-subspace k-means codebooks must reconstruct strictly better
    than the first-K stand-in (k-means minimizes exactly this quantization
    MSE; the stand-in is an arbitrary sample) — the claim the module
    docstring makes for the production tier, pinned."""
    from temporalvault_spark.operators.pq import (
        _pq_emb,
        pq_encode,
        pq_train_codebooks,
    )

    vecs = {
        int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
        for r in emb_pdf.itertuples()
    }

    def recon_err(codes: dict[int, list[int]], cw) -> float:
        # cw(j, c) -> PQ_SUB-dim codeword
        tot = 0.0
        for vid, v in vecs.items():
            rec = np.concatenate([cw(j, codes[vid][j]) for j in range(PQ_M)])
            tot += float(((v - rec) ** 2).sum())
        return tot

    # first-K tier (numpy replication, already pinned to equal the engine)
    cb0 = np.stack([vecs[c] for c in range(PQ_K)])
    err_firstk = recon_err(
        _np_codes(vecs), lambda j, c: cb0[c, j * PQ_SUB : (j + 1) * PQ_SUB]
    )

    # trained tier: engine encode against the k-means codebook row
    e = _pq_emb(spark, sf_dir)
    cb_row = pq_train_codebooks(e, max_iter=10)
    folded = cb_row.first()["cb"]
    assert len(folded) == PQ_M * PQ_K
    cwmap = {(s["sub"], s["code"]): np.asarray(s["cw"]) for s in folded}
    codes_t = {
        r["vec_id"]: list(r["codes"]) for r in pq_encode(e, cb_row).collect()
    }
    err_trained = recon_err(codes_t, lambda j, c: cwmap[(j, c)])
    assert err_trained < err_firstk


def test_fold_codebook_row_rejects_malformed(spark):
    """The exact-sorted-sequence validation must catch corruptions the old
    count/max-code check passed: a duplicate cell displacing a missing one
    (still M*K cells, max code K-1), shifted sub ranges, and wrong-width
    codewords — each would silently misalign the positional layout."""
    from temporalvault_spark.operators.pq import fold_codebook_row

    def frame(cells):
        return spark.createDataFrame(cells, "sub int, code bigint, cw array<double>")

    ok = [(j, c, [float(j * PQ_K + c)] * PQ_SUB) for j in range(PQ_M) for c in range(PQ_K)]
    assert fold_codebook_row(frame(ok)).first()["cb"][0]["sub"] == 0

    dup = [cell for cell in ok if (cell[0], cell[1]) != (0, 3)]
    dup.append((0, 7, [9.0] * PQ_SUB))  # 128 cells, max code still 15
    with pytest.raises(ValueError):
        fold_codebook_row(frame(dup))

    shifted = [(j + 1, c, cw) for j, c, cw in ok]  # subs 1..8
    with pytest.raises(ValueError):
        fold_codebook_row(frame(shifted))

    short = [(j, c, cw if (j, c) != (2, 5) else cw[:-1]) for j, c, cw in ok]
    with pytest.raises(ValueError):
        fold_codebook_row(frame(short))

    # surplus duplicate of the LAST cell: `want` is a prefix of sorted `got`,
    # so the mismatch search finds no differing zip pair — the diagnostic
    # itself must not crash with StopIteration
    surplus = ok + [(PQ_M - 1, PQ_K - 1, [42.0] * PQ_SUB)]
    with pytest.raises(ValueError, match="cells"):
        fold_codebook_row(frame(surplus))
