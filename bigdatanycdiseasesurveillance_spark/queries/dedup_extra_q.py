"""Dedup queries registered AFTER the driver-gate prefix (rows arrive
in a later round; prefix slots stay with queries still missing rows)."""

from __future__ import annotations

from ..operators import dedup as D
from ..registry import register
from ..tables import table


@register(
    "dedup_simhash_md5",
    oracle="""
        WITH toks AS (
            SELECT doc_id,
                   list_distinct(list_filter(string_split(lower(text), ' '),
                                             t -> t <> '')) AS tok
            FROM documents
        ), tokr AS (
            SELECT doc_id, unnest(tok) AS t FROM toks
        ), th AS (
            SELECT doc_id,
                   CAST(('0x' || substr(md5('sim:' || t), 1, 15)) AS BIGINT) AS h
            FROM tokr
        ), bits AS (
            SELECT doc_id, bb.b,
                   SUM((h >> bb.b) & 1) AS ones, COUNT(*) AS n
            FROM th CROSS JOIN (SELECT unnest(range(48)) AS b) bb
            GROUP BY doc_id, bb.b
        ), sig AS (
            SELECT doc_id,
                   CAST(SUM(CASE WHEN 2 * ones > n
                                 THEN CAST(1 AS BIGINT) << CAST(b AS INTEGER)
                                 ELSE 0 END) AS BIGINT) AS sig
            FROM bits GROUP BY doc_id
        ), chunks AS (
            SELECT doc_id, sig, cc.c,
                   (sig >> (16 * CAST(cc.c AS INTEGER))) & 65535 AS chunk
            FROM sig CROSS JOIN (SELECT unnest(range(3)) AS c) cc
        ), cand AS (
            SELECT DISTINCT a.doc_id AS id_a, a.sig AS sig_a,
                            b.doc_id AS id_b, b.sig AS sig_b
            FROM chunks a
            JOIN chunks b ON a.c = b.c AND a.chunk = b.chunk
                         AND a.doc_id < b.doc_id
        )
        SELECT id_a, id_b,
               CAST(bit_count(xor(sig_a, sig_b)) AS BIGINT) AS hamming
        FROM cand
        WHERE bit_count(xor(sig_a, sig_b)) <= 8
    """,
    tags=("dedup", "M2", "simhash", "oracle-replayable"),
)
def dedup_simhash_md5(spark, sf_dir):
    """SimHash near-dup pairs on an md5-derived hash family: the full
    pipeline (per-token hash -> 48 bit votes -> signature -> 16-bit
    chunk blocking -> Hamming verify) replayed bit-for-bit by DuckDB.
    The xxhash64 simhash stays the fast path; this row proves the
    bit-vote/blocking algorithm itself."""
    return D.simhash_md5_pairs(table(spark, sf_dir, "documents"))
