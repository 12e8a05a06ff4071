

def test_heavy_hitters_sketch_superset(spark, sf_dir):
    """freqItems is lossy but one-sided: every true >support-frequency term
    must appear in the sketch output (supersets allowed, misses not)."""
    from pyspark.sql import functions as F

    from temporalvault_spark.operators.llm import heavy_hitters_sketch

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    terms = docs.select(F.explode(F.split(F.lower(F.trim("text")), " ")).alias("term"))
    total = terms.count()
    support = 0.02
    exact = {
        r["term"]
        for r in terms.groupBy("term").count().filter(F.col("count") > support * total).collect()
    }
    sketch = set(heavy_hitters_sketch(docs, support))
    assert exact <= sketch, exact - sketch


def test_doc_unigram_logprob_crafted(spark):
    """2-doc corpus where every token has p=0.5: both docs score exactly
    ln 2 per token, regardless of length."""
    import math

    from temporalvault_spark.operators.llm import unigram_logprob

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b")], "doc_id bigint, text string"
    )
    out = unigram_logprob(docs)
    got = {r["doc_id"]: (r["n_tokens"], r["avg_neg_logprob"]) for r in out.collect()}
    ln2 = round(math.log(2), 6)
    assert got == {1: (3, ln2), 2: (1, ln2)}


def test_pii_scrub_crafted_and_engine_parity(spark, tmp_path):
    """Crafted PII-dense docs: redaction order, per-category counts, and —
    because the testdata corpus contains no PII, so the registry parity
    sweep never exercises a match — a direct Spark-vs-DuckDB comparison on
    the SAME crafted parquet to prove the Java-regex/RE2 patterns agree
    where they actually fire."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entrymod

    texts = [
        (0, "contact bob.smith+x@example.com or ops@sub.domain.io today"),
        (1, "server at 192.168.0.1 and 10.0.0.255 rebooted"),
        (2, "call +1 555 123 4567 or 0800-555-0199 now"),
        (3, "mix: a@b.co at 8.8.8.8 ring 12345678901"),
        (4, "no pii here at all"),
        (5, None),
    ]
    pdf = pd.DataFrame(
        [dict(doc_id=i, text=t, lang="en", source="s", n_chars=len(t or "")) for i, t in texts]
    )
    pdf["doc_id"] = pdf["doc_id"].astype("int64")
    pdf["n_chars"] = pdf["n_chars"].astype("int64")
    import os
    import shutil

    from tests.conftest import SF_SMALL

    dst = str(tmp_path)
    for f in os.listdir(SF_SMALL):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(SF_SMALL, f), os.path.join(dst, f))
    pdf.to_parquet(os.path.join(dst, "documents.parquet"), index=False)

    rows = entrymod.queries()["pii_scrub"](spark, dst).collect()
    got = {r["doc_id"]: r for r in rows}
    assert got[0]["n_emails"] == 2 and "<EMAIL>" in got[0]["clean_text"]
    assert "@" not in got[0]["clean_text"]
    assert got[1]["n_ips"] == 2 and got[1]["clean_text"].count("<IP>") == 2
    assert got[2]["n_phones"] == 2 and got[2]["clean_text"].count("<PHONE>") == 2
    assert (got[3]["n_emails"], got[3]["n_ips"], got[3]["n_phones"]) == (1, 1, 1)
    assert got[4]["has_pii"] is False and got[4]["clean_text"] == texts[4][1]
    assert got[5]["clean_text"] is None

    # engine parity where matches fire
    from tests.oracle_check import compare, duckdb_conn

    con = duckdb_conn(dst)
    ok, msg = compare(
        entrymod.queries()["pii_scrub"](spark, dst), con, entrymod.oracle_sql()["pii_scrub"]
    )
    assert ok, msg


def test_html_strip_crafted_markup(spark):
    """html_strip on actual markup (the testdata corpus has none, so oracle
    parity alone never exercises the strip): tags go to spaces, entities
    decode exactly one level, whitespace collapses, NULL passes through."""
    from temporalvault_spark.operators.llm import html_strip

    rows = [
        (0, "<p>Hello <b>world</b></p>", "en", "web", 25),
        (1, "a &amp;lt; b &amp; c &lt;tag&gt; &quot;q&quot; &#39;s&#39; x&nbsp;y", "en", "web", 60),
        (2, "no markup here", "en", "web", 14),
        (3, None, "en", "web", 0),
        (4, "<div class='x'><span>nested</span> <br/> ok</div>", "en", "web", 49),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    got = {r["doc_id"]: (r["clean_text"], r["n_tags"], r["changed"]) for r in html_strip(df).collect()}
    assert got[0] == ("Hello world", 4, True)
    # &amp;lt; -> '&lt;' (ONE decode level), &amp; -> '&', entities decode
    assert got[1] == ('a &lt; b & c <tag> "q" \'s\' x y', 0, True)
    assert got[2] == ("no markup here", 0, False)
    assert got[3] == (None, None, None)
    assert got[4] == ("nested ok", 5, True)


def test_bigram_logprob_crafted(spark):
    """Hand-computed conditional MLE: corpus 'a b', 'a c' gives
    P(b|a) = P(c|a) = 1/2 -> both docs score ln 2; and on an asymmetric
    corpus the exact conditional values hold (-ln 2/3 for the common
    transition, -ln 1/3 for the rare one), with the rarer transition
    scoring strictly worse."""
    import math

    from temporalvault_spark.operators.llm import bigram_logprob

    docs = spark.createDataFrame(
        [(0, "a b", "en", "s", 3), (1, "a c", "en", "s", 3), (2, "a", "en", "s", 1)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_neg_logprob2"]) for r in bigram_logprob(docs).collect()}
    ln2 = round(math.log(2.0), 6)
    assert got[0] == (1, ln2) and got[1] == (1, ln2)
    assert 2 not in got  # single-token doc: no bigrams, no row

    # asymmetric corpus: the x->y transition is twice as likely as x->z
    docs3 = spark.createDataFrame(
        [(0, "x y", "en", "s", 3), (1, "x y", "en", "s", 3), (2, "x z", "en", "s", 3)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    got3 = {r["doc_id"]: r["avg_neg_logprob2"] for r in bigram_logprob(docs3).collect()}
    assert got3[0] == got3[1] == round(-math.log(2.0 / 3.0), 6)
    assert got3[2] == round(-math.log(1.0 / 3.0), 6)
    assert got3[2] > got3[0]  # the rarer transition scores worse


def test_pii_scan_crafted_and_engine_parity(spark, tmp_path):
    """The plain pii_scan is pytest-pinned, not driver-registered (its
    ledger row was a vacuous 0 = 0 on the PII-free corpus — round-12
    verdict #2; pii_scan_dense is the registered value-checked form). So
    prove it HERE on a crafted corpus where matches FIRE: per-category
    counts and a direct Spark-vs-DuckDB value comparison."""
    import os
    import shutil

    import pandas as pd

    from temporalvault_spark.operators.llm import PII_SCAN_ORACLE, q_pii_scan
    from tests.conftest import SF_SMALL
    from tests.oracle_check import compare, duckdb_conn

    texts = [
        (0, "mail me at a.b-c@ex-ample.org or x@y.io soon"),
        (1, "see https://example.com/path and http://a.b/c?q=1"),
        (2, "dial 555 123 4567 or 800-555-0199 x2"),
        (3, "clean words only here"),
        (4, None),
    ]
    pdf = pd.DataFrame(
        [dict(doc_id=i, text=t, lang="en", source="s", n_chars=len(t or "")) for i, t in texts]
    )
    pdf["doc_id"] = pdf["doc_id"].astype("int64")
    pdf["n_chars"] = pdf["n_chars"].astype("int64")
    dst = str(tmp_path)
    for f in os.listdir(SF_SMALL):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(SF_SMALL, f), os.path.join(dst, f))
    pdf.to_parquet(os.path.join(dst, "documents.parquet"), index=False)

    got = {r["doc_id"]: r for r in q_pii_scan(spark, dst).collect()}
    assert set(got) == {0, 1, 2}  # clean + NULL docs pruned
    assert got[0]["n_emails"] == 2
    assert got[1]["n_urls"] == 2
    assert got[2]["n_phoneish"] >= 1

    con = duckdb_conn(dst)
    ok, msg = compare(q_pii_scan(spark, dst), con, PII_SCAN_ORACLE)
    assert ok, msg


def test_pii_scan_not_registered_and_zero_row_sweep(spark, sf_dir):
    """The retirement contract: (a) pii_scan is OUT of the driver registry
    (no oracled ledger row may be a 0 = 0 comparison) while pii_scan_dense
    remains registered; (b) the clean-corpus zero-row behavior both engines
    agreed on for five rounds stays pinned here as a regression."""
    import __spark_entry__ as entrymod
    from temporalvault_spark.operators.llm import PII_SCAN_ORACLE, q_pii_scan
    from tests.oracle_check import duckdb_conn

    assert "pii_scan" not in entrymod.queries()
    assert "pii_scan" not in entrymod.oracle_sql()
    assert "pii_scan_dense" in entrymod.oracle_sql()
    assert q_pii_scan(spark, sf_dir).count() == 0
    assert len(duckdb_conn(sf_dir).execute(PII_SCAN_ORACLE).fetchall()) == 0


def test_dsir_selects_target_domain_lookalikes(spark, sf_dir, tmp_path):
    """DSIR semantics on a crafted corpus: src0 (the target proxy) speaks
    an 'alpha' vocabulary, other sources speak 'beta'; a beta-source doc
    WRITTEN IN alpha vocabulary must outrank every pure-beta doc — the
    selection scores text distribution, not source labels."""
    import os
    import shutil

    import pandas as pd

    import __spark_entry__ as entrymod

    dst = str(tmp_path / "sfdsir")
    os.makedirs(dst)
    for f in os.listdir(sf_dir):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(sf_dir, f), os.path.join(dst, f))
    alpha = " ".join(f"alpha{i}" for i in range(30))
    beta = " ".join(f"beta{i}" for i in range(30))
    rows = []
    for i in range(20):  # the target domain: alpha speakers in src0
        rows.append((i, "src0", alpha, "en", len(alpha)))
    for i in range(20, 60):  # raw corpus bulk: beta speakers elsewhere
        rows.append((i, f"src{1 + i % 3}", beta, "en", len(beta)))
    rows.append((999, "src9", alpha, "en", len(alpha)))  # the lookalike
    pd.DataFrame(
        rows, columns=["doc_id", "source", "text", "lang", "n_chars"]
    ).to_parquet(os.path.join(dst, "documents.parquet"), index=False)

    got = entrymod.queries()["dsir_select_topk"](spark, dst).collect()
    scores = {r["doc_id"]: r["score"] for r in got}
    assert 999 in scores  # the alpha-speaking outsider is selected
    beta_scores = [r["score"] for r in got if 20 <= r["doc_id"] < 60]
    assert all(scores[999] > s for s in beta_scores) or not beta_scores
    # and it scores exactly like the target docs (same token multiset)
    assert scores[999] == scores[0]
