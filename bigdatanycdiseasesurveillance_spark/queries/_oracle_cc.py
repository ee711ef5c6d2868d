"""Shared DuckDB oracle fragment: blocked-Jaccard connected components
at the DISTINCT-SET-GROUP level.

Several oracles replay the engine's dedup-group composition (blocked
Jaccard pairs -> min-label connected components -> a rollup). The
original replays walked the DOC-level pair graph, which is quadratic on
template-heavy corpora and made those oracles sf1-infeasible (the r5
audit's oracle-timeout tier) even though the engine side completes.

Docs sharing (source, length-bucket, token set) are mutually connected
at jaccard exactly 1.0, so collapsing them to one group node with
(c = member count, min_id = canonical candidate, n_raw_sum, rep_raw)
preserves the component partition exactly; the recursive walk then runs
on the group graph, whose size follows distinct content. The builder
returns a WITH-clause prefix defining:

- toks(doc_id, source, bkt, tok, n_raw)  -- docs passing min_tokens
- gb(gid, source, bkt, mask, c, min_id, n_raw_sum, rep_raw)
- glabel(gid, comp)                       -- min-label component per group
- ccanon(comp, canonical)                 -- component canonical = min doc id
- dlabel(doc_id, canonical)               -- per-doc canonical map
  (docs below min_tokens appended as singletons when
   singletons_below=True — matching walks that start from `documents`)
- wpairs(w, ga, gbid)                     -- multiplicity-weighted
  qualifying pair terms: cross-group weights c_a*c_b plus within-group
  C(c,2), exactly the doc-level blocked qualifying pair multiset

Thresholds are the exact fixed-point device (je4 >= 7000 ==
round(jaccard, 4) >= 0.7 — the engine's filter in operators/dedup.
jaccard_pairs).
"""

from __future__ import annotations

_TOK_FILTER = (
    "len(list_filter(string_split(lower(text), ' '), t -> t <> ''))"
)


def group_cc_prefix(min_tokens: int = 1, singletons_below: bool = True) -> str:
    singleton_sql = (
        f"""
            UNION ALL
            SELECT doc_id, doc_id FROM documents
            WHERE {_TOK_FILTER} < {min_tokens}
        """
        if singletons_below
        else ""
    )
    return f"""
        WITH RECURSIVE toks AS (
            SELECT doc_id, source,
                   CAST(floor(n_chars / 50) AS BIGINT) AS bkt,
                   list_distinct(list_filter(string_split(lower(text), ' '),
                                             t -> t <> '')) AS tok,
                   CAST({_TOK_FILTER} AS BIGINT) AS n_raw
            FROM documents
            WHERE {_TOK_FILTER} >= {min_tokens}
        ), tokr AS (
            SELECT doc_id, unnest(tok) AS t FROM toks
        ), dict AS (
            SELECT t, ROW_NUMBER() OVER (ORDER BY t) - 1 AS tid
            FROM (SELECT DISTINCT t FROM tokr)
        ), m AS (
            SELECT r.doc_id, CAST(SUM(1::BIGINT << d.tid) AS BIGINT) AS mask
            FROM tokr r JOIN dict d ON r.t = d.t GROUP BY r.doc_id
        ), gb AS (
            SELECT ROW_NUMBER() OVER (ORDER BY t.source, t.bkt, m.mask) AS gid,
                   t.source, t.bkt, m.mask,
                   CAST(COUNT(*) AS BIGINT) AS c,
                   MIN(t.doc_id) AS min_id,
                   CAST(SUM(t.n_raw) AS BIGINT) AS n_raw_sum,
                   CAST(arg_min(t.n_raw, t.doc_id) AS BIGINT) AS rep_raw
            FROM toks t JOIN m ON m.doc_id = t.doc_id
            GROUP BY t.source, t.bkt, m.mask
        ), gedges AS (
            SELECT a.gid AS s, b.gid AS d
            FROM gb a JOIN gb b
              ON a.source = b.source AND a.bkt = b.bkt AND a.mask < b.mask
            WHERE (20000 * bit_count(a.mask & b.mask)
                   + bit_count(a.mask | b.mask))
                  // (2 * bit_count(a.mask | b.mask)) >= 7000
        ), edges AS (
            SELECT s, d FROM gedges UNION ALL SELECT d, s FROM gedges
        ), walk(node, comp) AS (
            SELECT gid, gid FROM gb
            UNION
            SELECT e.d, w.comp FROM walk w JOIN edges e ON e.s = w.node
            WHERE w.comp < e.d
        ), glabel AS (
            SELECT node AS gid, MIN(comp) AS comp FROM walk GROUP BY node
        ), ccanon AS (
            SELECT gl.comp, MIN(gb.min_id) AS canonical
            FROM glabel gl JOIN gb ON gb.gid = gl.gid
            GROUP BY gl.comp
        ), dlabel AS (
            SELECT t.doc_id, cc.canonical
            FROM toks t
            JOIN m ON m.doc_id = t.doc_id
            JOIN gb ON gb.source = t.source AND gb.bkt = t.bkt
                   AND gb.mask = m.mask
            JOIN glabel gl ON gl.gid = gb.gid
            JOIN ccanon cc ON cc.comp = gl.comp
            {singleton_sql}
        ), wpairs AS (
            SELECT a.c * b.c AS w, a.gid AS ga, b.gid AS gbid
            FROM gb a JOIN gb b
              ON a.source = b.source AND a.bkt = b.bkt AND a.mask < b.mask
            WHERE (20000 * bit_count(a.mask & b.mask)
                   + bit_count(a.mask | b.mask))
                  // (2 * bit_count(a.mask | b.mask)) >= 7000
            UNION ALL
            SELECT c * (c - 1) // 2, gid, gid FROM gb WHERE c >= 2
        )
    """
