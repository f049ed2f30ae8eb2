"""Sequential store-growth semantics of dedup_incremental (planted batches).

Oracle parity (scripts/check_parity.py + the driver) pins Spark≡DuckDB on the
fixture corpus; these tests pin the SEMANTICS on planted documents where the
expected status of every increment doc is known by construction:

* the store grows with accepted docs — a batch-2 doc duplicating a doc
  ACCEPTED in batch 1 is dup_of_seen, not new;
* dropped docs never enter the store — a batch-2 doc whose only near-dup
  partner was itself dropped in batch 1 comes out new.
"""

from __future__ import annotations

from openfactverification_spark import testdata_queries as tq
from openfactverification_spark.operators import dual

_S = dual.D("spark")

# batch = doc_id % 3: 0 -> corpus, 1 -> first increment, 2 -> second increment
_T0 = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
_T1 = "one two three four five six seven eight nine ten"
_T2 = "kilo lima mike november oscar papa quebec romeo sierra tango"
_T3 = "uniform victor whiskey xray yankee zulu apple banana cherry dog"
_DOCS = [
    (0, _T0),  # corpus
    (3, _T1),  # corpus
    (1, _T0),  # b1: dup of corpus doc 0
    (4, _T2),  # b1: new
    (7, _T2),  # b1: dup of batch-mate 4
    (2, _T2),  # b2: dup of ACCEPTED batch-1 doc 4 (store grew)
    (5, _T3),  # b2: new
    (8, _T3),  # b2: dup of batch-mate 5
]


def _register_docs(spark):
    spark.createDataFrame(_DOCS, ["doc_id", "text"]).createOrReplaceTempView(
        "documents"
    )
    # the planted view shadows the fixture table: force testdata_queries'
    # _register_views to re-register real tables for whoever runs next
    spark.conf.set("spark.ofv.registered_sf", "")


def _statuses(df):
    return {r["doc_id"]: (r["batch_id"], r["status"], r["dup_of"]) for r in df.collect()}


def test_store_growth_with_minhash_pairs(spark):
    """End-to-end through the real pair machinery: identical texts pair at
    jaccard 1.0, and the batch rules classify every increment doc."""
    _register_docs(spark)
    pairs = spark.sql(dual.q_dedup_minhash_lsh(_S, threshold=0.9))
    got = _statuses(tq.incremental_from_pairs(spark, pairs))
    assert got == {
        1: (1, "dup_of_seen", 0),
        4: (1, "new", None),
        7: (1, "dup_in_batch", 4),
        2: (2, "dup_of_seen", 4),
        5: (2, "new", None),
        8: (2, "dup_in_batch", 5),
    }


def test_dropped_docs_never_enter_store(spark):
    """Injected pair chain 3~10, 10~11 (jaccard is not transitive): doc 10 is
    dropped as a corpus dup, so doc 11 — whose only partner is the DROPPED
    doc — is new, exactly what a signature store that only appends accepted
    docs would say."""
    docs = [(3, "corpus doc"), (10, "near dup of corpus"), (11, "near dup of ten")]
    spark.createDataFrame(docs, ["doc_id", "text"]).createOrReplaceTempView(
        "documents"
    )
    pairs = spark.createDataFrame([(3, 10), (10, 11)], ["id_a", "id_b"])
    got = _statuses(tq.incremental_from_pairs(spark, pairs))
    assert got == {
        10: (1, "dup_of_seen", 3),
        11: (2, "new", None),
    }
