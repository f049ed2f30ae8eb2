"""V-stage operators: query fan-out cap/order (T5), evidence top-k (T2), and the
T3 applyInPandas passage selector vs a pure-Python reference."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from openfactverification_spark.operators import enrich as enrich_ops
from openfactverification_spark.operators import passages as passage_ops
from openfactverification_spark.operators import verify as verify_ops
from openfactverification_spark.plans.pipeline import build_pipeline
from openfactverification_spark.sources.transcripts import transcripts_df


def _routed(spark, n=512):
    return build_pipeline(spark, transcripts_df(spark, n)).routed


def test_query_fanout_cap_and_claim_first(spark):
    qs = verify_ops.generate_queries(_routed(spark))
    per_claim = qs.groupBy("conv_id", "turn_idx", "claim_idx", "claim").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.when(F.col("query_idx") == 0, F.col("query"))).alias("first_query"),
    )
    bad = per_claim.filter(
        (F.col("n") > verify_ops.MAX_QUERY_PER_CLAIM)
        | (F.col("first_query") != F.col("claim"))
    )
    assert bad.count() == 0
    assert qs.count() > 0


def test_evidence_topk_bounded_and_ranked(spark):
    topk = verify_ops.evidence_topk(_routed(spark), enrich_ops.evidence_dim(spark))
    per_claim = topk.groupBy("conv_id", "turn_idx", "claim_idx").agg(
        F.count(F.lit(1)).alias("n"), F.max("rnk").alias("max_rnk")
    )
    assert per_claim.filter(F.col("n") > verify_ops.EVIDENCE_TOP_K).count() == 0
    assert per_claim.filter(F.col("max_rnk") != F.col("n")).count() == 0


def test_ce_score_udf_matches_sql_twin(spark):
    """The predict_batch_udf-pattern scorer (functions/scoring.py, reference
    extension point Retriever/base.py:19-23) must be byte-identical to its SQL
    twin — that equivalence is what makes the 'model inference' stage
    oracle-checkable."""
    from openfactverification_spark.functions.scoring import (
        ce_score_sql,
        ce_score_udf,
    )

    routed = _routed(spark)
    det = (
        routed.filter((F.col("record_kind") == "claim") & F.col("checkworthy"))
        .select("claim", "claim_norm")
        .join(F.broadcast(enrich_ops.evidence_dim(spark)), "claim_norm")
        .select("claim", "evidence_text")
    )
    both = det.withColumn("udf_score", ce_score_udf()("claim", "evidence_text")).withColumn(
        "sql_score", F.expr(ce_score_sql("claim", "evidence_text", "spark"))
    )
    assert both.count() > 0
    assert both.filter("udf_score <> sql_score").count() == 0


def test_select_passages_matches_python_reference(spark):
    # Build overlapping chunks for a few synthetic docs directly.
    rows = []
    for doc in range(20):
        for start in range(0, 40, 8):
            text = f"doc{doc} chunk starting {start} with deterministic words"
            rows.append((doc, start, start + 10, text))
    chunks = spark.createDataFrame(
        rows, "doc_id long, start_word int, end_word int, chunk_text string"
    )
    scored = passage_ops.with_scores(chunks)

    got = {
        tuple(r)
        for r in passage_ops.select_passages(scored)
        .orderBy("doc_id", "sel_rank")
        .collect()
    }

    pdf = scored.toPandas()
    expected = set()
    for _, grp in pdf.groupby("doc_id"):
        out = passage_ops.select_passages_pdf(grp)
        expected |= {tuple(r) for r in out.itertuples(index=False)}
    assert got == expected
    # JVM-side score formula must equal the Python md5 formula.
    sample = pdf.iloc[0]
    assert passage_ops.chunk_score(sample["chunk_text"]) == sample["score"]


def test_passage_selection_no_overlap_and_cap(spark):
    rows = [
        (1, s, s + 10, f"t{s}") for s in range(0, 100, 2)
    ]  # heavily overlapping
    chunks = spark.createDataFrame(
        rows, "doc_id long, start_word int, end_word int, chunk_text string"
    )
    sel = (
        passage_ops.select_passages(passage_ops.with_scores(chunks))
        .orderBy("sel_rank")
        .collect()
    )
    assert 0 < len(sel) <= passage_ops.MAX_PASSAGES
    ivs = [(r["start_word"], r["end_word"]) for r in sel]
    for i, (s1, e1) in enumerate(ivs):
        for s2, e2 in ivs[i + 1 :]:
            assert e1 <= s2 or e2 <= s1  # disjoint


def test_set_ops_formulation_equivalence(spark):
    """customer_set_ops' single-pass membership aggregate must equal the
    literal INTERSECT / EXCEPT set-operator formulation (spec vs plan)."""
    from openfactverification_spark.operators.dual import D, q_customer_set_ops
    from openfactverification_spark.sources.tables import table_path

    spark.read.parquet(table_path("/root/testdata/sf0.01", "events")).createOrReplaceTempView("events")
    row = spark.sql(q_customer_set_ops(D("spark"))).first()
    early = "SELECT DISTINCT user_id FROM events WHERE cast(ts as date) <= date '2024-02-15'"
    late = "SELECT DISTINCT user_id FROM events WHERE cast(ts as date) > date '2024-02-15'"
    n_both = spark.sql(f"SELECT count(*) n FROM (({early}) INTERSECT ({late}))").first()["n"]
    n_early_only = spark.sql(f"SELECT count(*) n FROM (({early}) EXCEPT ({late}))").first()["n"]
    assert row["n_both"] == n_both
    assert row["n_early_only"] == n_early_only
    assert row["n_users"] == row["n_both"] + row["n_early_only"] + row["n_late_only"]
    spark.conf.set("spark.ofv.registered_sf", "")


def test_split_leakfree_epoch_disjoint_mix_nested(spark):
    """Training-assembly trio (dual.py): (1) the content-keyed split keeps
    planted exact dupes in ONE split (n_leaky = 0 structurally, and the dupes
    land together); (2) epoch_shuffle gives different permutations per epoch;
    (3) mix_domains quotas are nested prefixes: a bigger quota strictly
    extends the smaller membership."""
    from openfactverification_spark.operators import dual
    from openfactverification_spark.operators.dual import D
    from openfactverification_spark.sources.tables import table_path

    _s = D("spark")
    docs = spark.read.parquet(table_path("/root/testdata/sf0.001", "documents"))
    # plant exact duplicates: copy 40 docs under fresh ids
    dupes = docs.limit(40).selectExpr(
        "doc_id + 1000000 AS doc_id", "text", "lang", "source", "n_chars"
    )
    docs.unionByName(dupes).createOrReplaceTempView("documents")

    rows = spark.sql(dual.q_split_train_holdout(_s)).collect()
    assert sum(r["n_docs"] for r in rows) == docs.count() + 40
    assert all(r["n_leaky"] == 0 for r in rows)
    # every planted dupe shares its original's split (content-keyed buckets)
    pair_splits = spark.sql(f"""
        WITH s AS (SELECT doc_id, {dual.H.h7('lower(trim(text))', 'spark')} % 100 AS b
                   FROM documents)
        SELECT count(*) AS n FROM s a JOIN s b ON a.doc_id + 1000000 = b.doc_id
        WHERE a.b <> b.b""").first()
    assert pair_splits["n"] == 0

    e1 = [r["doc_id"] for r in spark.sql(dual.q_epoch_shuffle(_s, epoch=1)).collect()]
    e2 = [r["doc_id"] for r in spark.sql(dual.q_epoch_shuffle(_s, epoch=2)).collect()]
    assert len(e1) == len(e2) == 100
    assert e1 != e2  # different epoch, different order

    kept_sql = """
        WITH stats AS (SELECT lang, count(*) AS n,
               CASE lang WHEN 'en' THEN 0.30 WHEN 'de' THEN 0.20 WHEN 'es' THEN 0.20
                         WHEN 'fr' THEN 0.15 WHEN 'zh' THEN 0.15 END AS t
               FROM documents GROUP BY lang),
        scale AS (SELECT min(n / t) * {f} AS s FROM stats),
        quota AS (SELECT lang, cast(floor(t * s) as bigint) AS keep_n
                  FROM stats CROSS JOIN scale),
        ranked AS (SELECT doc_id, lang,
                  row_number() OVER (PARTITION BY lang ORDER BY {h}, doc_id) AS rnk
                  FROM documents)
        SELECT r.doc_id FROM ranked r JOIN quota q ON r.lang = q.lang
        WHERE r.rnk <= q.keep_n"""
    h = dual.H.h7("text", "spark")
    small = {r["doc_id"] for r in spark.sql(kept_sql.format(f=0.5, h=h)).collect()}
    large = {r["doc_id"] for r in spark.sql(kept_sql.format(f=1.0, h=h)).collect()}
    assert small < large  # strict nested-prefix membership
    spark.conf.set("spark.ofv.registered_sf", "")
