"""True-BPE merge-table tier: trainer determinism and the greedy
left-to-right no-re-merge apply semantics, pinned on a crafted corpus where
every merge and count is hand-derivable (oracle parity alone can't prove
the MERGES are the intended ones)."""

import os
import shutil

import pandas as pd
import pytest

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def bpe_dir(tmp_path_factory):
    """sf0.001 tables with documents replaced by a two-doc crafted corpus:
    doc0 = 'aaab aaab aaab', doc1 = 'aaa aaa', doc2 = NULL text."""
    dst = str(tmp_path_factory.mktemp("bpe"))
    for f in os.listdir(SF_SMALL):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(SF_SMALL, f), os.path.join(dst, f))
    pdf = pd.DataFrame(
        [
            dict(doc_id=0, text="aaab aaab aaab", lang="en", source="s", n_chars=14),
            dict(doc_id=1, text="aaa aaa", lang="en", source="s", n_chars=7),
            dict(doc_id=2, text=None, lang="en", source="s", n_chars=0),
        ]
    )
    pdf["doc_id"] = pdf["doc_id"].astype("int64")
    pdf["n_chars"] = pdf["n_chars"].astype("int64")
    pdf.to_parquet(os.path.join(dst, "documents.parquet"), index=False)
    return dst


def test_bpe_trainer_learns_cascading_merges(spark, bpe_dir):
    """Hand-derived merge table: round 1 learns the char pairs
    ('a a' weight 3*2+2*2=10, 'a b' weight 3); round 2 learns the CASCADED
    pairs over round-1 output ('aa ab' from aaab -> [aa, ab]; 'aa a' from
    aaa -> [aa, a] — the greedy LTR parity rule leaves the odd trailing a);
    round 3 has nothing left to merge."""
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["bpe_train_merges"](spark, bpe_dir).collect()
    got = {(r["round"], r["merge_rank"]): (r["pair"], r["weight"]) for r in rows}
    assert got == {
        (1, 1): ("a a", 10),
        (1, 2): ("a b", 3),
        (2, 1): ("aa ab", 3),
        (2, 2): ("aa a", 2),
    }


def test_bpe_token_counts_after_full_merge(spark, bpe_dir):
    """After 2 effective rounds both words collapse to single tokens:
    doc0 = 3 words -> 3 tokens, doc1 = 2 -> 2; NULL text counts 0."""
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["token_count_bpe2"](spark, bpe_dir).collect()
    got = {r["doc_id"]: r["n_bpe2_tokens"] for r in rows}
    assert got == {0: 3, 1: 2, 2: 0}


def test_bpe_greedy_ltr_parity_on_odd_runs(spark, bpe_dir):
    """The 'aaa' word exercises the run-parity rule directly: with 'a a'
    in the merge set, greedy LTR yields [aa, a] (positions 0 merges, 1 is
    blocked), NEVER [a, aa] — pinned via the round-2 learned pair 'aa a'
    (a left-biased split; the wrong parity would learn 'a aa')."""
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["bpe_train_merges"](spark, bpe_dir).collect()
    round2 = {r["pair"] for r in rows if r["round"] == 2}
    assert "aa a" in round2
    assert "a aa" not in round2


def _train_reference(word_counts, rounds, merges_per_round):
    """Sequential pure-Python BPE trainer with the exact production
    semantics: per round, count adjacent pairs over every word's current
    segmentation (each in-word occurrence counts, weighted by word count),
    take the top ``merges_per_round`` by (count DESC, pair ASC), then apply
    ALL of them in one greedy-LTR no-re-merge pass per word."""
    seg = {w: [c for c in w] for w in word_counts}
    merge_rows = []
    for r in range(1, rounds + 1):
        pair_counts: dict[str, int] = {}
        for w, toks in seg.items():
            n = word_counts[w]
            for i in range(len(toks) - 1):
                p = f"{toks[i]} {toks[i + 1]}"
                pair_counts[p] = pair_counts.get(p, 0) + n
        top = sorted(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[
            :merges_per_round
        ]
        if not top:
            break
        merge_rows += [(r, i + 1, p, c) for i, (p, c) in enumerate(top)]
        merges = {p for p, _ in top}
        seg = {w: _merge_step_reference(toks, merges) for w, toks in seg.items()}
    return merge_rows, seg


def test_bpe_trainer_full_depth_differential(spark):
    """Sequential-reference differential at BPE_ROUNDS_FULL (16) depth on a
    randomized corpus — the r5 verdict's ask: the hash oracle pins only the
    3-round prefix of the 1k-merge trainer, so the beyond-prefix rounds
    need a direct reference, not prefix-implied trust. A small
    merges_per_round (3) over long low-entropy words keeps every one of the
    16 rounds learning something (64 merges/round on a tiny alphabet would
    exhaust the pair space in a few rounds and leave the tail rounds
    untested); both the full merge table (pair AND weight, all 16 rounds)
    and the final per-word segmentation must match exactly."""
    import random

    from temporalvault_spark.operators.llm import BPE_ROUNDS_FULL, bpe_train_segment

    rng = random.Random(0xB9E)
    words = [
        "".join(rng.choice("ab") for _ in range(rng.randint(1, 24)))
        for _ in range(40)
    ]
    docs_text = []
    for _ in range(30):
        docs_text.append(" ".join(rng.choice(words) for _ in range(rng.randint(1, 8))))
    docs = spark.createDataFrame([(t,) for t in docs_text], "text string")

    word_counts: dict[str, int] = {}
    for t in docs_text:
        for w in t.lower().strip().split(" "):
            if w:
                word_counts[w] = word_counts.get(w, 0) + 1

    ref_rows, ref_seg = _train_reference(word_counts, BPE_ROUNDS_FULL, 3)
    got_rows, got_seg_df = bpe_train_segment(docs, BPE_ROUNDS_FULL, 3)

    assert got_rows == ref_rows, (
        f"merge-table divergence: first diff "
        f"{next((a, b) for a, b in zip(got_rows, ref_rows) if a != b)}"
    )
    # deep rounds actually ran — the differential covers the full depth
    assert max(r for r, _, _, _ in got_rows) == BPE_ROUNDS_FULL
    got_seg = {r["word"]: list(r["toks"]) for r in got_seg_df.collect()}
    assert got_seg == ref_seg


def _merge_step_reference(toks, merges):
    """Straightforward greedy left-to-right single-pass merge: at each
    position, if (cur, next) is a merge pair, fuse and skip both (a token
    created this round cannot merge again this round)."""
    out, i = [], 0
    while i < len(toks):
        if i + 1 < len(toks) and f"{toks[i]} {toks[i + 1]}" in merges:
            out.append(toks[i] + toks[i + 1])
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out


def test_merge_step_parity_formulation_matches_reference_property():
    """The run-parity vectorization ('a pair merges iff mergeable and an
    even number of consecutive mergeable pairs precede it') must equal the
    sequential greedy-LTR reference on ALL inputs, including overlapping
    chains like a,a,a. Evaluates the EXACT production DuckDB fragment
    (BPE_DIALECT['duck'] — textually parallel to the Spark fragment, whose
    cross-engine equality the oracle hash-check pins) via hypothesis over a
    tiny alphabet chosen to maximize merge collisions."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from temporalvault_spark.operators.llm import BPE_DIALECT

    d = BPE_DIALECT["duck"]
    con = duckdb.connect()

    alphabet = ["a", "b", "c", "aa", "ab"]
    pair_pool = sorted({f"{x} {y}" for x in alphabet for y in alphabet})

    @settings(max_examples=200, deadline=None)
    @given(
        toks=st.lists(st.sampled_from(alphabet), min_size=0, max_size=9),
        merges=st.sets(st.sampled_from(pair_pool), max_size=8),
    )
    def check(toks, merges):
        ml = sorted(merges)
        sql = f"""WITH s0 AS (SELECT $toks::VARCHAR[] AS toks, $ml::VARCHAR[] AS ml),
        s1 AS (SELECT toks, ml, {d['m_expr']} AS m FROM s0),
        s2 AS (SELECT toks, ml, m, {d['ma_expr']} AS ma FROM s1)
        SELECT {d['out_expr']} AS out FROM s2"""
        got = con.execute(sql, {"toks": toks, "ml": ml}).fetchone()[0]
        assert got == _merge_step_reference(toks, merges), (toks, ml, got)

    check()
