"""Round-13 verdict task 5: the five band-family occupancy probes report
hot-bucket ``max_bucket``/``skew`` (max bucket rows vs the even-split mean
— the centroid family's skew semantic), because a boilerplate-heavy corpus
concentrates one (band, bkt) bucket (the known LSH failure mode) while the
mean ``occupancy`` column stays flat. Crafted hot-bucket corpora prove the
column actually FIRES; the oracled registered probes carry the same two
columns cross-engine (swept in the driver-identical run)."""

from temporalvault_spark.operators.minhash_index import (
    build_minhash_index,
    minhash_index_occupancy,
)
from temporalvault_spark.operators.phash import ahash_frame
from temporalvault_spark.operators.phash_index import (
    build_phash_index,
    phash_index_occupancy,
)
from temporalvault_spark.operators.rp_lsh_index import (
    build_rp_index,
    rp_index_occupancy,
)
from tests.test_phash import _half_split, _ppm

BOILER = (
    "terms of service apply to all users and this boilerplate footer is "
    "identical across every page of the site including contact and legal"
)


def _docs_df(spark, texts, id0=0):
    return spark.createDataFrame(
        [(id0 + i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )


def _uniq(i):
    return " ".join(f"tok{i}x{j}" for j in range(24))


def _check_identity(rep):
    """skew = max_bucket / (rows / n_bkts) — i.e. max_bucket / occupancy,
    up to the fields' independent rounding (both quant6 micro-units since
    round 14 — half-up FLOOR at 6 decimals, the one cross-engine idiom)."""
    assert abs(rep["skew"] - rep["max_bucket"] / rep["occupancy"]) < 0.01


def test_minhash_skew_fires_on_boilerplate_corpus(spark, tmp_path_factory):
    """12 byte-identical boilerplate docs share every per-band min-hash, so
    one bucket per band holds all 12 — max_bucket pins the pile-up and
    skew (max/mean) rises well above the balanced corpus's."""
    hot = str(tmp_path_factory.mktemp("mh_hot") / "idx")
    build_minhash_index(
        _docs_df(spark, [BOILER] * 12 + [_uniq(i) for i in range(8)]), hot
    )
    rep = minhash_index_occupancy(spark, hot)
    assert rep["max_bucket"] >= 12
    _check_identity(rep)

    bal = str(tmp_path_factory.mktemp("mh_bal") / "idx")
    build_minhash_index(_docs_df(spark, [_uniq(i) for i in range(20)]), bal)
    rep_bal = minhash_index_occupancy(spark, bal)
    _check_identity(rep_bal)
    assert rep["skew"] > 2 * rep_bal["skew"]
    assert rep_bal["max_bucket"] < rep["max_bucket"]


def test_rp_skew_fires_on_duplicate_vectors(spark, tmp_path_factory):
    """Near-parallel copies of one direction land in the same bucket in
    every band (RP signs are scale-invariant); spread directions do not."""
    base = [0.9, -0.3, 0.5, 0.1, -0.7, 0.2, 0.4, -0.6]

    def emb(rows):
        return spark.createDataFrame(
            rows, "vec_id bigint, embedding array<float>, label int"
        )

    hot_rows = [(i, [(1.0 + 0.01 * i) * x for x in base], 0) for i in range(10)]
    spread_rows = [
        (100 + i, [(1.0 if j % (i + 2) else -1.0) * base[j] for j in range(8)], 0)
        for i in range(6)
    ]
    hot = str(tmp_path_factory.mktemp("rp_hot") / "idx")
    build_rp_index(emb(hot_rows + spread_rows), hot)
    rep = rp_index_occupancy(spark, hot)
    assert rep["max_bucket"] >= 10  # the pile-up bucket holds every copy
    assert rep["skew"] > 1.5
    _check_identity(rep)


def test_phash_band64_skew_fires_on_identical_images(spark, tmp_path_factory):
    """The shared Band64Index.occupancy (phash/afp/vfp families): six
    byte-identical images collide in all four bands."""
    base = _half_split()
    rows = [(i, _ppm(base)) for i in range(6)]
    # three genuinely different images: invert a strip per image
    for k in range(3):
        px = list(base)
        for j in range(k * 12, k * 12 + 12):
            px[j] = (255, 255, 255) if px[j] == (0, 0, 0) else (0, 0, 0)
        rows.append((10 + k, _ppm(px)))
    path = str(tmp_path_factory.mktemp("ph_hot") / "idx")
    build_phash_index(
        ahash_frame(
            spark.createDataFrame(rows, "img_id bigint, image binary")
        ).localCheckpoint(eager=True),
        path,
    )
    rep = phash_index_occupancy(spark, path)
    assert rep["max_bucket"] >= 6
    assert rep["skew"] > 1.0
    _check_identity(rep)
