"""Round-12 ADVICE closures (all three items):

- ``append_to_ivf_index`` / ``append_to_ivfpq_index`` must run adopt-on-read
  swap recovery BEFORE touching the ``_centroids`` sidecar, like every other
  reader of a centroid index — an append issued inside
  ``atomic_swap_rebuild``'s two-rename crash window must self-repair, not
  fail with a path-not-found AnalysisException;
- ``centroid_index_occupancy`` over a valid-but-empty index (buildable by
  passing explicit centroids over a fully-filtered corpus, which passes the
  build's k_meta fail-fast) must raise a diagnostic ValueError, not an
  UNABLE_TO_INFER_SCHEMA AnalysisException or a TypeError on int(None);
- ``_dsir_mix_takes``' micro-unit recovery must use the repo's half-UP
  quantization idiom (floor(x*1e6 + 0.5), now ``corpus.micro_units``), not
  Python's banker's-rounding round().
"""

import os

import pytest

from temporalvault_spark.operators.ivf_index import (
    append_to_ivf_index,
    build_ivf_index,
    centroid_index_occupancy,
    ivf_search,
)


def _rand_emb(spark, n, dim=4, seed=7, start=0):
    import numpy as np

    rng = np.random.RandomState(seed)
    rows = [
        (start + i, [float(x) for x in rng.uniform(-1, 1, dim)], int(i % 3))
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int"
    )


def _crash_mid_swap(path):
    """atomic_swap_rebuild's crash window: the first rename ran
    (path -> path.old), the second never did."""
    os.rename(path, f"{path}.old")
    assert not os.path.exists(path) and os.path.isdir(f"{path}.old")


def test_ivf_append_adopts_mid_swap_crash(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf_adopt") / "idx")
    build_ivf_index(_rand_emb(spark, 60), path)
    _crash_mid_swap(path)

    batch = _rand_emb(spark, 10, seed=11, start=1000)
    append_to_ivf_index(batch, path)  # must self-repair, not path-not-found

    assert os.path.isdir(path) and not os.path.exists(f"{path}.old")
    idx = spark.read.parquet(path)
    assert idx.count() == 70
    assert idx.filter("vec_id >= 1000").count() == 10
    # and the appended rows are probe-visible through the adopted layout
    probe = batch.filter("vec_id = 1000").first()["embedding"]
    hits = {r["vec_id"] for r in ivf_search(spark, path, probe, k=3, nprobe=4).collect()}
    assert 1000 in hits


def test_ivfpq_append_adopts_mid_swap_crash(spark, sf_dir, tmp_path_factory):
    from temporalvault_spark.operators.ivfpq_index import (
        append_to_ivfpq_index,
        build_ivfpq_index,
        ivfpq_search,
    )

    path = str(tmp_path_factory.mktemp("ivfpq_adopt") / "idx")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.filter("vec_id < 400")
    batch = emb.filter("vec_id >= 400 and vec_id < 420")
    build_ivfpq_index(base, path)
    _crash_mid_swap(path)

    append_to_ivfpq_index(batch, path)  # must self-repair, not path-not-found

    assert os.path.isdir(path) and not os.path.exists(f"{path}.old")
    idx = spark.read.parquet(path)
    assert idx.filter("vec_id >= 400").count() == batch.count()
    probe = batch.selectExpr("cast(embedding as array<double>)").first()[0]
    assert ivfpq_search(spark, path, probe, k=5, nprobe=4).count() == 5


def test_occupancy_on_empty_index_raises_diagnostic(spark, tmp_path_factory):
    """Explicit centroids over a fully-filtered corpus build a valid,
    zero-row index (k_meta >= 1 passes); probing its occupancy must name
    the problem, matching the build-time fail-fast style."""
    path = str(tmp_path_factory.mktemp("ivf_empty") / "idx")
    emb = spark.createDataFrame(
        [(0, None, 0)], "vec_id bigint, embedding array<double>, label int"
    )
    cents = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0, 0.0])], "centroid_id bigint, ce array<double>"
    )
    build_ivf_index(emb, path, centroids=cents)
    with pytest.raises(ValueError, match="no data rows"):
        centroid_index_occupancy(spark, path)


def test_micro_units_is_half_up_not_bankers():
    from temporalvault_spark.operators.corpus import micro_units

    # banker's round() would give 2 and 4 on the .5 ties; the repo idiom
    # is half-UP (floor(x*1e6 + 0.5)). Exact ties are unreachable in the
    # live path (scores are ROUND(,6)-ed first, so x*1e6 is near-integral)
    # — see constants.micro_units for the negative-tie asymmetry scope.
    assert micro_units(2.5e-6) == 3
    assert micro_units(4.5e-6) == 5
    assert round(2.5) == 2  # the divergence this guards against
    assert micro_units(1.9999999e-6) == 2  # float-repr error absorbed
    assert micro_units(-3.2e-6) == -3
    assert micro_units(-2.5e-6) == -2  # floor(+0.5): toward +inf, documented
