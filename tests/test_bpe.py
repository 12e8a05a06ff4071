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
