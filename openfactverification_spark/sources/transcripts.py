"""Deterministic synthetic `transcripts` source — the pipeline's primary input.

Schema (BASELINE.json input_hint):
    conv_id: string, turn_idx: int, role: string, text: string,
    tool: string (nullable), ts: timestamp

The generator is **pure arithmetic over a row id** — no RNG state, no wall clock —
so the identical table is reproducible at any scale, in any engine, from a formula.
It is rendered in two dialects:

  * ``transcripts_df(spark, n)``      — Spark ``range(n).selectExpr(...)`` (scales to
    10^12 rows: `range` is a parallel, splittable source; every column is a JVM-side
    codegen'd expression, zero Python in the loop);
  * ``transcripts_duckdb_sql(n)``     — the same formula as a DuckDB SELECT, used as
    the independent oracle for driver correctness checks.

Text content mirrors the checkworthy/unworthy mix of the reference's test corpora
(/root/reference/script/minimal_test_en.json:3-57 and minimal_test_zh.json):
verifiable claims, opinion sentences, vague-pronoun sentences, CJK sentences
(。-terminated, no trailing space), and an abbreviation-bearing sentence ("Dr.")
exercising the rule-pack's protect rules; tool turns carry a grok-parsable
invocation (`CALL tool(q="...") -> status`). Sentences are joined with a single
space; the parser's raw segments partition each turn text gap-free, so spans
concatenate back to the turn exactly (the reference's span contract,
/root/reference/factcheck/core/Decompose.py:92-107).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# --------------------------------------------------------------------------------------
# Shared constants (single source of truth for generator, dims, and oracles)
# --------------------------------------------------------------------------------------

# (text, kind, checkworthy, reason, [(stance, url_suffix), ...])
# kind ∈ {fact, opinion, vague}; stance ∈ {SUPPORTS, REFUTES, IRRELEVANT}
# (reference stance vocabulary: /root/reference/factcheck/utils/prompt/chatgpt_prompt.py:105)
SENTS: list[dict] = [
    dict(i=0, text="The Eiffel Tower is located in Paris.", kind="fact", checkworthy=True,
         reason="Verifiable geographic fact.", evidence=["SUPPORTS", "SUPPORTS", "IRRELEVANT"]),
    dict(i=1, text="Water boils at 100 degrees Celsius.", kind="fact", checkworthy=True,
         reason="Verifiable physical fact.", evidence=["SUPPORTS", "SUPPORTS"]),
    dict(i=2, text="The moon is made of cheese.", kind="fact", checkworthy=True,
         reason="Verifiable astronomical claim.", evidence=["REFUTES", "REFUTES"]),
    dict(i=3, text="I think this design is elegant.", kind="opinion", checkworthy=False,
         reason="Opinion, not a factual claim.", evidence=[]),
    dict(i=4, text="He is a professor at the university.", kind="vague", checkworthy=False,
         reason="Unresolved pronoun reference.", evidence=[]),
    dict(i=5, text="The GDP of Argentina grew by 5 percent.", kind="fact", checkworthy=True,
         reason=None, evidence=[]),  # absent from checkworthy dim -> fallback rule path
    dict(i=6, text="Apollo 11 landed on the moon in 1969.", kind="fact", checkworthy=True,
         reason="Verifiable historical fact.", evidence=["SUPPORTS", "SUPPORTS", "SUPPORTS"]),
    dict(i=7, text="In my opinion the interface is confusing.", kind="opinion", checkworthy=False,
         reason="Opinion, not a factual claim.", evidence=[]),
    dict(i=8, text="She won the award in 2019.", kind="vague", checkworthy=False,
         reason="Unresolved pronoun reference.", evidence=[]),
    dict(i=9, text="Mount Everest is the tallest mountain on Earth.", kind="fact", checkworthy=True,
         reason="Verifiable geographic fact.", evidence=["SUPPORTS", "IRRELEVANT"]),
    dict(i=10, text="The vaccine causes severe side effects.", kind="fact", checkworthy=True,
         reason="Verifiable medical claim.", evidence=["SUPPORTS", "REFUTES"]),
    dict(i=11, text="I believe we should refactor this module.", kind="opinion", checkworthy=False,
         reason="Opinion, not a factual claim.", evidence=[]),
    dict(i=12, text="Berlin is the capital of Germany.", kind="fact", checkworthy=True,
         reason="Verifiable geographic fact.", evidence=["SUPPORTS"]),
    dict(i=13, text="The company reported record profits last quarter.", kind="fact", checkworthy=True,
         reason="Verifiable financial claim.", evidence=["IRRELEVANT", "IRRELEVANT"]),
    dict(i=14, text="They moved to a new office downtown.", kind="vague", checkworthy=False,
         reason=None, evidence=[]),  # absent from checkworthy dim -> fallback rule path
    dict(i=15, text="Bitcoin was created in 2009.", kind="fact", checkworthy=True,
         reason="Verifiable historical fact.", evidence=["SUPPORTS", "REFUTES", "REFUTES"]),
    # CJK rows (multilingual segmentation — template: the reference's zh test
    # corpus, /root/reference/script/minimal_test_zh.json; 。 terminator, no
    # trailing space).
    dict(i=16, text="地球绕着太阳转。", kind="fact", checkworthy=True,
         reason="可验证的天文事实。", evidence=["SUPPORTS", "SUPPORTS"]),
    dict(i=17, text="长城位于中国。", kind="fact", checkworthy=True,
         reason=None, evidence=[]),  # absent from dim -> fallback rule path (zh)
    dict(i=18, text="我认为这个设计很优雅。", kind="opinion", checkworthy=False,
         reason="主观意见，非事实断言。", evidence=[]),
    # Abbreviation row: "Dr. " must NOT split (rule-pack protect rule).
    dict(i=19, text="Dr. Smith works at Stanford University.", kind="fact", checkworthy=True,
         reason="Verifiable employment claim.", evidence=["SUPPORTS", "IRRELEVANT"]),
]

# (tool, category, description); 'code' is deliberately absent from the tool_metadata
# dim to exercise the coalesce-default enrich path (J1 default semantics,
# /root/reference/factcheck/__init__.py:175,188).
TOOLS: list[tuple[str, str, str]] = [
    ("search", "retrieval", "Web search"),
    ("calc", "compute", "Calculator"),
    ("browse", "retrieval", "Web browser"),
    ("code", "compute", "Code interpreter"),
]
TOOLS_IN_DIM = ("search", "calc", "browse")

STATUSES = ["ok", "ok", "ok", "error", "timeout"]
ROLES = ["user", "assistant", "tool"]
TURNS_PER_CONV = 8
DEFAULT_REASON = "No reason provided, please report issue."  # factcheck/__init__.py:175

EPOCH = "2025-01-01 00:00:00"


# --------------------------------------------------------------------------------------
# Dialect helpers
# --------------------------------------------------------------------------------------

def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _arr(dialect: str, items: list[str]) -> str:
    lits = ", ".join(_q(s) for s in items)
    return f"array({lits})" if dialect == "spark" else f"[{lits}]"


def _elem(dialect: str, arr: str, idx: str) -> str:
    """1-based element_at with a 0-based idx expression."""
    if dialect == "spark":
        return f"element_at({arr}, cast(({idx}) as int) + 1)"
    return f"list_extract({arr}, cast(({idx}) as int) + 1)"


def _transcript_exprs(dialect: str, t: str = "t") -> dict[str, str]:
    """Column expressions keyed by output column name, in dialect `dialect`."""
    sents = _arr(dialect, [s["text"] for s in SENTS])
    tools = _arr(dialect, [x[0] for x in TOOLS])
    statuses = _arr(dialect, STATUSES)

    div = "div" if dialect == "spark" else "//"
    conv_seq = f"({t} {div} {TURNS_PER_CONV})"
    turn_idx = f"cast(({t} % {TURNS_PER_CONV}) as int)"
    role_sel = f"({t} % {TURNS_PER_CONV}) % 3"
    is_tool = f"(({role_sel}) = 2)"
    n_sents = f"(1 + (({t} * 13) % 3))"
    # selector arithmetic mixes in conv_seq so selections decorrelate from the
    # within-conversation position (t % 8); multipliers chosen coprime to moduli
    n_s = len(SENTS)
    tool_name = _elem(dialect, tools, f"({t} + {conv_seq}) % 4")
    qtext = _elem(dialect, sents, f"({t} * 11 + {conv_seq}) % {n_s}")
    status = _elem(dialect, statuses, f"{t} % 5")
    sent_j = _elem(dialect, sents, f"({t} * 7 + {conv_seq} + j * 5) % {n_s}")

    if dialect == "spark":
        cast_str = "string"
        body = f"array_join(transform(sequence(0, cast({n_sents} as int) - 1), j -> {sent_j}), ' ')"
        ts = (
            f"timestamp'{EPOCH}' + make_interval(0, 0, 0, cast({t} % 5 as int), 0, 0, "
            f"cast(({t} * 37) % 86400 as int))"
        )
    else:
        cast_str = "varchar"
        body = f"array_to_string(list_transform(range(0, {n_sents}), j -> {sent_j}), ' ')"
        ts = (
            f"TIMESTAMP '{EPOCH}' + (({t} % 5) * INTERVAL 1 DAY) + "
            f"((({t} * 37) % 86400) * INTERVAL 1 SECOND)"
        )

    conv_id = f"'conv-' || lpad(cast({conv_seq} as {cast_str}), 6, '0')"
    text = (
        f"CASE WHEN {is_tool} "
        f"THEN 'CALL ' || {tool_name} || '(q=\"' || {qtext} || '\") -> ' || {status} "
        f"ELSE {body} END"
    )
    tool = f"CASE WHEN {is_tool} THEN {tool_name} ELSE NULL END"
    role = _elem(dialect, _arr(dialect, ROLES), role_sel)

    return {
        "conv_id": conv_id,
        "turn_idx": turn_idx,
        "role": role,
        "text": text,
        "tool": tool,
        "ts": ts,
    }


# --------------------------------------------------------------------------------------
# Public API
# --------------------------------------------------------------------------------------

def transcripts_df(spark: SparkSession, n_turns: int, skew_pct: int = 0) -> DataFrame:
    """The transcripts table as a lazy Spark DataFrame of `n_turns` rows.

    `spark.range` is a splittable parallel source, so this scales to arbitrary row
    counts with zero driver-side materialization. With ``skew_pct>0``, that percent
    of all turns is funneled into one mega conversation (`conv-mega`) to exercise
    salted windowing / AQE skew handling (bench + skew tests only; the oracle-checked
    shape uses skew_pct=0).
    """
    exprs = _transcript_exprs("spark", t="id")
    if skew_pct:
        exprs = dict(exprs)
        exprs["conv_id"] = (
            f"CASE WHEN id % 100 < {skew_pct} THEN 'conv-mega' ELSE {exprs['conv_id']} END"
        )
        exprs["turn_idx"] = (
            f"CASE WHEN id % 100 < {skew_pct} THEN cast(id as int) ELSE {exprs['turn_idx']} END"
        )
    return spark.range(0, n_turns).selectExpr(
        *[f"{e} AS {name}" for name, e in exprs.items()]
    )


def transcripts_duckdb_sql(n_turns: int) -> str:
    """The identical table as a DuckDB SELECT (oracle side)."""
    exprs = _transcript_exprs("duckdb", t="t")
    cols = ",\n  ".join(f"{e} AS {name}" for name, e in exprs.items())
    return f"SELECT\n  {cols}\nFROM range(0, {n_turns}) AS r(t)"


def checkworthy_labels_rows() -> list[tuple[str, bool, str]]:
    """The broadcast checkworthiness dictionary (claim_norm, checkworthy, reason).

    Stand-in for the LLM classifier output shape of
    /root/reference/factcheck/core/CheckWorthy.py:39-48. Two templates are
    deliberately missing so the default-on-miss path (J1) is exercised.
    """
    return [
        (s["text"].lower(), bool(s["checkworthy"]), s["reason"])
        for s in SENTS
        if s["reason"] is not None
    ]


def evidence_corpus_rows() -> list[tuple[str, int, str, str, str]]:
    """The broadcast evidence corpus (claim_norm, rank, url, stance, evidence_text).

    No-network stand-in for Serper/web retrieval
    (/root/reference/factcheck/core/Retriever/serper_retriever.py:20-45).
    """
    rows = []
    for s in SENTS:
        for rank, stance in enumerate(s["evidence"]):
            rows.append(
                (
                    s["text"].lower(),
                    rank + 1,
                    f"https://evidence.example/{s['i']}/{rank}",
                    stance,
                    f"Snippet {rank} about: {s['text']}",
                )
            )
    return rows


def tool_metadata_rows() -> list[tuple[str, str, str]]:
    return [(t, c, d) for t, c, d in TOOLS if t in TOOLS_IN_DIM]
