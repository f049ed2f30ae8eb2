"""DuckDB-SQL oracle for the transcript pipeline.

Mirrors parse → enrich → route → aggregate as one WITH-chain over the *same*
deterministic transcripts formula (sources/transcripts.py renders both dialects
from one set of constants). This gives the driver an independent engine computing
the identical result — the correctness gate for every pipeline query.

The oracle favors clarity over speed (window-function spans instead of the
shuffle-free array trick) — result equality is the contract, not plan equality.
"""

from __future__ import annotations

from ..operators.parse import MIN_SENT_LEN
from ..operators.verify import (
    EVIDENCE_TOP_K as _EVIDENCE_TOP_K,
    MAX_QUERY_PER_CLAIM as _MAX_QUERY_PER_CLAIM,
    QUERY_TEMPLATES as _QUERY_TEMPLATES,
)
from ..functions.bpe import bpe_token_count_expr as _bpe_expr
from ..functions.scoring import ce_score_sql as _ce_score_sql
from ..rulepack import DEFAULT_PACK
from ..sources.transcripts import (
    DEFAULT_REASON,
    checkworthy_labels_rows,
    evidence_corpus_rows,
    tool_metadata_rows,
    transcripts_duckdb_sql,
)

# Oracle regexes come from the SAME rule-pack the Spark pipeline loads — the
# oracle executes the pack, it does not duplicate it.
TOOL_RE_SQL = DEFAULT_PACK.tool_call_pattern
OPINION_RE_SQL = DEFAULT_PACK.opinion_pattern
VAGUE_RE_SQL = DEFAULT_PACK.vague_pattern


def _q(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return str(v)
    return "'" + str(v).replace("'", "''") + "'"


def _values_cte(name: str, cols: list[str], rows: list[tuple]) -> str:
    vals = ",\n    ".join("(" + ", ".join(_q(v) for v in r) + ")" for r in rows)
    return f"{name} AS (SELECT * FROM (VALUES\n    {vals}\n  ) t({', '.join(cols)}))"


def pipeline_ctes(n_turns: int, scrub: bool = False) -> str:
    """The full WITH-chain: transcripts, records, enriched, routed.

    With ``scrub=True`` the transcripts CTE is wrapped with the PII
    seed-and-scrub stage (operators/scrub.py — the same dual-dialect template
    the Spark side executes), so the whole downstream chain runs over redacted
    text in both engines."""
    cw = _values_cte(
        "cw_dim", ["claim_norm", "cw_label", "cw_reason"], checkworthy_labels_rows()
    )
    ev = _values_cte(
        "ev_dim",
        ["claim_norm", "rank", "url", "stance", "evidence_text"],
        evidence_corpus_rows(),
    )
    tools = _values_cte(
        "tool_dim",
        ["tool_name", "tool_category", "tool_description"],
        tool_metadata_rows(),
    )

    if scrub:
        from ..operators.dual import D as _D
        from ..operators.scrub import scrubbed_text_expr, seeded_text_expr

        _d = _D("duckdb")
        transcripts_cte = f"""transcripts_raw AS (
  {transcripts_duckdb_sql(n_turns)}
),
transcripts AS (
  SELECT conv_id, turn_idx, role,
         {scrubbed_text_expr(_d, f"({seeded_text_expr(_d)})")} AS text,
         tool, ts
  FROM transcripts_raw
)"""
    else:
        transcripts_cte = f"""transcripts AS (
  {transcripts_duckdb_sql(n_turns)}
)"""

    return f"""WITH {transcripts_cte},
{cw},
{ev},
{tools},
stance_dim AS (
  SELECT claim_norm,
         SUM(CASE WHEN stance = 'SUPPORTS' THEN 1 ELSE 0 END)::INT AS n_supports0,
         SUM(CASE WHEN stance = 'REFUTES' THEN 1 ELSE 0 END)::INT AS n_refutes0,
         COUNT(*)::INT AS n_evidence0
  FROM ev_dim GROUP BY claim_norm
),
sentized AS (
  SELECT *, {DEFAULT_PACK.duckdb_split_sql('text')} AS sents
  FROM transcripts
  WHERE NOT regexp_matches(text, {_q(TOOL_RE_SQL)})
),
claims0 AS (
  SELECT conv_id, turn_idx, role, ts, text,
         unnest(sents) AS seg,
         CAST(unnest(range(0, len(sents))) AS INT) AS claim_idx
  FROM sentized
),
spanned AS (
  SELECT conv_id, turn_idx, role, ts, text, claim_idx, seg,
         CAST(COALESCE(SUM(length(seg)) OVER (
             PARTITION BY conv_id, turn_idx ORDER BY claim_idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS INT) AS span_start
  FROM claims0
),
records AS (
  SELECT conv_id, turn_idx, role, ts, text, 'claim' AS record_kind, claim_idx,
         trim(seg) AS claim, span_start,
         CAST(span_start + length(seg) AS INT) AS span_end,
         NULL::VARCHAR AS tool_name, NULL::VARCHAR AS tool_query, NULL::VARCHAR AS tool_status
  FROM spanned
  WHERE length(trim(seg)) >= {MIN_SENT_LEN}
  UNION ALL BY NAME
  SELECT conv_id, turn_idx, role, ts, text, 'tool_call' AS record_kind,
         0 AS claim_idx, NULL::VARCHAR AS claim, NULL::INT AS span_start, NULL::INT AS span_end,
         regexp_extract(text, {_q(TOOL_RE_SQL)}, 1) AS tool_name,
         regexp_extract(text, {_q(TOOL_RE_SQL)}, 2) AS tool_query,
         regexp_extract(text, {_q(TOOL_RE_SQL)}, 3) AS tool_status
  FROM transcripts
  WHERE regexp_matches(text, {_q(TOOL_RE_SQL)})
),
enriched AS (
  SELECT r.*,
         lower(r.claim) AS claim_norm,
         CASE WHEN r.record_kind = 'claim' THEN COALESCE(
           c.cw_label,
           NOT (regexp_matches(lower(r.claim), {_q(OPINION_RE_SQL)})
                OR regexp_matches(lower(r.claim), {_q(VAGUE_RE_SQL)}))
           AND length(trim(lower(r.claim))) >= {MIN_SENT_LEN}
         ) END AS checkworthy,
         CASE WHEN r.record_kind = 'claim'
              THEN COALESCE(c.cw_reason, {_q(DEFAULT_REASON)}) END AS reason,
         COALESCE(s.n_supports0, 0) AS ns, COALESCE(s.n_refutes0, 0) AS nr,
         COALESCE(s.n_evidence0, 0) AS ne,
         t.tool_category AS tool_category0
  FROM records r
  LEFT JOIN cw_dim c ON lower(r.claim) = c.claim_norm
  LEFT JOIN stance_dim s ON lower(r.claim) = s.claim_norm
  LEFT JOIN tool_dim t ON r.tool_name = t.tool_name
),
enriched2 AS (
  SELECT conv_id, turn_idx, role, ts, text, record_kind, claim_idx, claim,
         span_start, span_end, tool_name, tool_query, tool_status, claim_norm,
         checkworthy, reason,
         CASE WHEN record_kind = 'claim' AND checkworthy THEN ns END AS n_supports,
         CASE WHEN record_kind = 'claim' AND checkworthy THEN nr END AS n_refutes,
         CASE WHEN record_kind = 'claim' AND checkworthy THEN ne END AS n_evidence,
         CASE WHEN record_kind = 'claim' AND checkworthy AND (ns + nr) > 0
              THEN ns::DOUBLE / (ns + nr) END AS factuality,
         CASE WHEN record_kind <> 'claim' THEN NULL
              WHEN NOT checkworthy THEN 'NOTHING_TO_CHECK'
              WHEN (ns + nr) = 0 THEN 'NO_EVIDENCE'
              ELSE 'SCORE' END AS factuality_tag,
         CASE WHEN record_kind = 'tool_call'
              THEN COALESCE(tool_category0, 'unknown') END AS tool_category
  FROM enriched
),
routed AS (
  SELECT *,
         CASE WHEN record_kind = 'tool_call' THEN 'tool_trace'
              WHEN NOT checkworthy THEN 'non_factual'
              WHEN factuality_tag = 'SCORE' THEN 'verdict'
              ELSE 'checkworthy' END AS route
  FROM enriched2
)"""


def _summary_select(keys: str) -> str:
    return f"""SELECT {keys},
       COUNT(*)::BIGINT AS n_records,
       SUM((record_kind = 'claim')::INT)::BIGINT AS n_claims,
       SUM((record_kind = 'claim' AND checkworthy)::INT)::BIGINT AS n_checkworthy,
       SUM((factuality_tag = 'SCORE')::INT)::BIGINT AS n_verified,
       SUM((factuality_tag = 'SCORE' AND factuality = 1.0)::INT)::BIGINT AS n_supported,
       SUM((factuality_tag = 'SCORE' AND factuality = 0.0)::INT)::BIGINT AS n_refuted,
       SUM((factuality_tag = 'SCORE' AND factuality > 0.0 AND factuality < 1.0)::INT)::BIGINT
         AS n_controversial,
       SUM((tool_status = 'error')::INT)::BIGINT AS n_tool_errors,
       ROUND(AVG(CASE WHEN factuality_tag = 'SCORE' THEN factuality END), 6) AS avg_factuality
FROM routed GROUP BY {keys}"""


def oracle_queries(n_turns: int) -> dict[str, str]:
    """Final SELECTs keyed by query name (matches __spark_entry__.queries())."""
    ctes = pipeline_ctes(n_turns)
    return {
        "pipeline_summary": f"{ctes}\n{_summary_select('route, role')}",
        "pipeline_summary_per_conv": f"{ctes}\n{_summary_select('route, role, conv_id')}",
        "pipeline_verdicts": f"""{ctes}
SELECT conv_id, turn_idx, claim_idx, role, claim, checkworthy, reason,
       n_supports, n_refutes, n_evidence, ROUND(factuality, 6) AS factuality,
       factuality_tag, route
FROM routed WHERE record_kind = 'claim'""",
        "pipeline_routed_counts": f"""{ctes}
SELECT route, COUNT(*)::BIGINT AS n FROM routed GROUP BY route""",
        # twin of entry_queries.q_pipeline_observe_metrics: the observe()
        # counter definitions restated over the routed relation, unpivoted to
        # (metric, value). COALESCE mirrors the Spark-side coalesce(checkworthy,
        # false) — non-claim records carry NULL checkworthy in both engines.
        "pipeline_observe_metrics": f"""{ctes},
m AS (
  SELECT COUNT(*)::BIGINT AS n_records,
         SUM((record_kind = 'claim')::INT)::BIGINT AS n_claims,
         SUM(COALESCE(checkworthy, FALSE)::INT)::BIGINT AS n_checkworthy,
         SUM((tool_status = 'error')::INT)::BIGINT AS n_tool_errors
  FROM routed
)
SELECT 'n_checkworthy' AS metric, n_checkworthy AS value FROM m
UNION ALL SELECT 'n_claims', n_claims FROM m
UNION ALL SELECT 'n_records', n_records FROM m
UNION ALL SELECT 'n_tool_errors', n_tool_errors FROM m""",
        "pipeline_parse_claims": f"""{ctes}
SELECT conv_id, turn_idx, claim_idx, claim, span_start, span_end
FROM records WHERE record_kind = 'claim'""",
        "pipeline_span_invariant": f"""{ctes}
SELECT conv_id, turn_idx,
       (MIN(span_start) = 0
        AND MAX(span_end) = length(any_value(text))
        AND SUM(span_end - span_start) = length(any_value(text))
        AND bool_and(claim = trim(substring(text, span_start + 1, span_end - span_start)))
       ) AS spans_ok
FROM records WHERE record_kind = 'claim'
GROUP BY conv_id, turn_idx""",
        "pipeline_tool_trace": f"""{ctes}
SELECT tool_name, tool_category, tool_status, COUNT(*)::BIGINT AS n
FROM routed WHERE route = 'tool_trace'
GROUP BY tool_name, tool_category, tool_status""",
        "pipeline_query_fanout": f"""{ctes},
cq AS (
  SELECT conv_id, turn_idx, claim_idx, claim,
         list_slice([claim] || [{", ".join(f"'{t}' || claim" for t in _QUERY_TEMPLATES)}],
                    1, {_MAX_QUERY_PER_CLAIM}) AS qs
  FROM routed WHERE record_kind = 'claim' AND checkworthy
)
SELECT conv_id, turn_idx, claim_idx, claim,
       CAST(unnest(range(0, len(qs))) AS INT) AS query_idx,
       unnest(qs) AS query
FROM cq""",
        "pipeline_evidence_topk": f"""{ctes},
cl AS (
  SELECT conv_id, turn_idx, claim_idx, claim_norm
  FROM routed WHERE record_kind = 'claim' AND checkworthy
),
det AS (
  SELECT cl.conv_id, cl.turn_idx, cl.claim_idx, e.rank, e.url, e.stance
  FROM cl JOIN ev_dim e USING (claim_norm)
),
rk AS (
  SELECT *, row_number() OVER (
      PARTITION BY conv_id, turn_idx, claim_idx ORDER BY rank, url) AS rnk
  FROM det
)
SELECT conv_id, turn_idx, claim_idx, rank, url, stance, CAST(rnk AS INT) AS rnk
FROM rk WHERE rnk <= {_EVIDENCE_TOP_K}""",
        "pipeline_evidence_topk_ce": f"""{ctes},
cl AS (
  SELECT conv_id, turn_idx, claim_idx, claim, claim_norm
  FROM routed WHERE record_kind = 'claim' AND checkworthy
),
det AS (
  SELECT cl.conv_id, cl.turn_idx, cl.claim_idx, e.url,
         {_ce_score_sql('cl.claim', 'e.evidence_text', 'duckdb')} AS ce_score
  FROM cl JOIN ev_dim e USING (claim_norm)
),
rk AS (
  SELECT *, row_number() OVER (
      PARTITION BY conv_id, turn_idx, claim_idx ORDER BY ce_score DESC, url) AS rnk
  FROM det
)
SELECT conv_id, turn_idx, claim_idx, url, ce_score, CAST(rnk AS INT) AS rnk
FROM rk WHERE rnk <= {_EVIDENCE_TOP_K}""",
        "pipeline_evidence_grouped": f"""{ctes},
cl AS (
  SELECT conv_id, turn_idx, claim_idx, claim_norm
  FROM routed WHERE record_kind = 'claim' AND checkworthy
),
det AS (
  SELECT cl.conv_id, cl.turn_idx, cl.claim_idx, e.rank, e.url
  FROM cl JOIN ev_dim e USING (claim_norm)
)
SELECT conv_id, turn_idx, claim_idx, COUNT(*)::BIGINT AS n_evidence_rows,
       string_agg(url, ',' ORDER BY rank, url) AS urls_ordered
FROM det GROUP BY conv_id, turn_idx, claim_idx""",
        "pipeline_rollup": ctes
        + "\n"
        + _summary_select("route, role")
        .replace(
            "FROM routed GROUP BY route, role",
            "FROM routed GROUP BY ROLLUP (route, role)",
        )
        .replace(
            "SELECT route, role,",
            "SELECT route, role,\n"
            "       CAST(GROUPING(route) * 2 + GROUPING(role) AS INT) AS grouping_level,",
        ),
        "pipeline_token_stats": f"""{ctes}
SELECT role, COUNT(*)::BIGINT AS n_turns,
       SUM(len(string_split(text, ' ')))::BIGINT AS sum_ws_tokens,
       SUM(len(regexp_extract_all(text, '\\w+|[^\\w\\s]')))::BIGINT AS sum_regex_tokens,
       SUM({_bpe_expr("text", "duckdb")})::BIGINT AS sum_bpe_tokens
FROM transcripts GROUP BY role""",
        "pipeline_dq_checks": f"""{ctes},
dq AS (
  SELECT COUNT(*)::BIGINT AS n_checked,
         SUM((role NOT IN ('user','assistant','tool'))::INT)::BIGINT AS role_in_domain,
         SUM((turn_idx < 0 OR turn_idx >= 8)::INT)::BIGINT AS turn_idx_in_range,
         SUM((text IS NULL OR length(text) = 0)::INT)::BIGINT AS text_nonempty,
         SUM((regexp_matches(text, {_q(TOOL_RE_SQL)}) <> (tool IS NOT NULL))::INT)::BIGINT
           AS tool_flag_consistent,
         SUM((tool IS NOT NULL
              AND regexp_extract(text, {_q(TOOL_RE_SQL)}, 1) <> tool)::INT)::BIGINT
           AS tool_name_matches,
         SUM((ts < TIMESTAMP '2025-01-01 00:00:00'
              OR ts >= TIMESTAMP '2025-01-07 00:00:00')::INT)::BIGINT AS ts_in_range
  FROM transcripts
)
SELECT t.check_name, dq.n_checked,
       CASE t.check_name
         WHEN 'role_in_domain' THEN role_in_domain
         WHEN 'turn_idx_in_range' THEN turn_idx_in_range
         WHEN 'text_nonempty' THEN text_nonempty
         WHEN 'tool_flag_consistent' THEN tool_flag_consistent
         WHEN 'tool_name_matches' THEN tool_name_matches
         ELSE ts_in_range END AS n_violations
FROM dq, (SELECT unnest(['role_in_domain','turn_idx_in_range','text_nonempty',
                         'tool_flag_consistent','tool_name_matches','ts_in_range'])
          AS check_name) t""",
        "pipeline_lang_id": f"""{ctes},
lang0 AS (
  SELECT role, text,
         len(regexp_extract_all(text, '[一-鿿]')) * 1.0 / length(text) AS cjk_ratio
  FROM transcripts
  WHERE NOT regexp_matches(text, {_q(TOOL_RE_SQL)})
)
SELECT CASE WHEN cjk_ratio >= 0.3 THEN 'zh' ELSE 'en' END AS predicted_lang,
       role,
       COUNT(*)::BIGINT AS n_turns,
       ROUND(AVG(cjk_ratio), 6) AS avg_cjk_ratio
FROM lang0 GROUP BY 1, 2""",
        "pipeline_round_robin": f"""{ctes},
rr AS (
  SELECT conv_id, turn_idx, claim_idx,
         CAST(row_number() OVER (
             PARTITION BY conv_id ORDER BY claim_idx, turn_idx) AS INT) AS rr_rank
  FROM routed WHERE record_kind = 'claim'
)
SELECT conv_id, turn_idx, claim_idx, rr_rank FROM rr WHERE rr_rank <= 5""",
        "pipeline_evidence_union": f"""{ctes},
cl AS (
  SELECT conv_id, turn_idx, claim_idx, claim_norm
  FROM routed WHERE record_kind = 'claim' AND checkworthy
),
unioned AS (
  SELECT conv_id, turn_idx, claim_idx, 'answer_box' AS source,
         'AnswerBox: ' || claim_norm AS evidence_text
  FROM cl
  UNION ALL
  SELECT cl.conv_id, cl.turn_idx, cl.claim_idx, 'organic' AS source, e.evidence_text
  FROM cl JOIN ev_dim e USING (claim_norm)
)
SELECT source, COUNT(*)::BIGINT AS n_evidence FROM unioned GROUP BY source""",
        "pipeline_tool_last_status": f"""{ctes}
SELECT conv_id, tool_name,
       arg_max(tool_status, turn_idx) AS last_status,
       MAX(turn_idx) AS last_turn_idx,
       COUNT(*)::BIGINT AS n_calls
FROM routed WHERE record_kind = 'tool_call'
GROUP BY conv_id, tool_name""",
        "pipeline_pii_scrubbed": _pii_scrubbed_sql(n_turns),
        "pipeline_training_pairs": f"""{ctes},
ua AS (
  SELECT conv_id, turn_idx, role, text,
         lead(role) OVER w AS next_role,
         lead(text) OVER w AS next_text,
         lead(turn_idx) OVER w AS next_turn_idx
  FROM transcripts
  WHERE role IN ('user', 'assistant')
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
)
SELECT conv_id, turn_idx,
       CAST(next_turn_idx AS INT) AS response_turn_idx,
       text AS prompt,
       next_text AS response,
       CAST(len(string_split(text, ' ')) AS INT) AS prompt_tokens,
       CAST(len(string_split(next_text, ' ')) AS INT) AS response_tokens,
       (len(string_split(text, ' ')) >= 3
        AND len(string_split(next_text, ' ')) >= 3) AS keep
FROM ua WHERE role = 'user' AND next_role = 'assistant'""",
        "pipeline_conv_docs": f"""{ctes},
docs AS (
  SELECT conv_id,
         string_agg(role || ': ' || text, chr(10) ORDER BY turn_idx) AS doc
  FROM transcripts GROUP BY conv_id
)
SELECT conv_id,
       CAST(length(doc) AS INT) AS n_chars,
       CAST(len(string_split(doc, ' ')) AS INT) AS n_tokens,
       md5(doc) AS fingerprint
FROM docs""",
    }


def _pii_scrubbed_sql(n_turns: int) -> str:
    """Flagship pipeline over seed-and-scrubbed transcripts (operators/scrub.py):
    per route, record counts, how many records carry a redaction placeholder,
    and the leak count (records still matching a raw PII regex — must be 0)."""
    from ..operators.scrub import PII_EMAIL_RE, PII_IPV4_RE, PII_PHONE_RE

    ctes = pipeline_ctes(n_turns, scrub=True)
    payload = "COALESCE(claim, text)"
    has_ph = " OR ".join(f"{payload} LIKE '%{p}%'" for p in ("<EMAIL>", "<PHONE>", "<IP>"))
    leaks = " OR ".join(
        f"regexp_matches({payload}, {_q(p)})"
        for p in (PII_EMAIL_RE, PII_PHONE_RE, PII_IPV4_RE)
    )
    return f"""{ctes}
SELECT route,
       COUNT(*)::BIGINT AS n_records,
       SUM(({has_ph})::INT)::BIGINT AS n_redacted_records,
       SUM(({leaks})::INT)::BIGINT AS n_leaks
FROM routed GROUP BY route"""
