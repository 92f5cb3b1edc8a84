#!/usr/bin/env python3
"""Deterministic scale-up generator for the text/vector corpora
(SURVEY round-7 10x drill, made reproducible — the round-7a generator
was session-ephemeral and cited only from the log).

Usage:
    python3 tools/gen_scale.py <mult> <srcSfDir> <outDir>
e.g. python3 tools/gen_scale.py 10 /root/testdata/sf0.1 /tmp/sf1x

Writes documents.parquet and embeddings.parquet at mult x the source
row count, fully hash-deterministic (no RNG):
  - documents: each source doc yields `mult` copies; copy 0 keeps the
    original text, copies k>0 reorder the SAME words by
    md5(word:newid:position) — vocabulary, word count, n_chars, lang
    and source distributions are preserved exactly, while the shingle
    structure is destroyed so NO cross-copy near-dup pairs are planted
    (a rotation would keep most 3-gram shingles and fake a dup corpus).
  - embeddings: copy k cyclically rotates the vector by k dims —
    the L2 norm is preserved exactly, cosine alignment with the source
    vector decays like a random draw from the same component
    distribution.
New ids are oldId * mult + k, so provenance stays recoverable.
"""
import sys

import duckdb


def main() -> None:
    mult, src, out = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW docs AS SELECT * FROM '{src}/documents.parquet'")
    con.execute(f"CREATE VIEW embs AS SELECT * FROM '{src}/embeddings.parquet'")
    import os
    os.makedirs(out, exist_ok=True)

    con.execute(f"""
        COPY (
          WITH copies AS (
            SELECT d.*, u.k, d.doc_id * {mult} + u.k AS new_id,
              string_split(d.text, ' ') AS ws
            FROM docs d, unnest(range(0, {mult})) AS u(k)),
          rebuilt AS (
            SELECT new_id, k, lang, source,
              CASE WHEN k = 0 THEN text ELSE (
                SELECT string_agg(ws[CAST(t.i AS INT)], ' ' ORDER BY
                  md5(ws[CAST(t.i AS INT)] || ':'
                      || CAST(new_id AS VARCHAR) || ':'
                      || CAST(t.i AS VARCHAR)), t.i)
                FROM unnest(range(1, len(ws) + 1)) AS t(i)
              ) END AS text
            FROM copies)
          SELECT new_id AS doc_id, text, lang, source,
            CAST(length(text) AS BIGINT) AS n_chars
          FROM rebuilt ORDER BY doc_id
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)""")

    con.execute(f"""
        COPY (
          SELECT e.vec_id * {mult} + u.k AS vec_id,
            CASE WHEN u.k = 0 THEN e.embedding
              ELSE list_concat(e.embedding[u.k + 1:],
                               e.embedding[:u.k]) END AS embedding,
            e.* EXCLUDE (vec_id, embedding)
          FROM embs e, unnest(range(0, {mult})) AS u(k)
          ORDER BY 1
        ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")

    nd = con.execute(f"SELECT COUNT(*), SUM(n_chars) FROM '{out}/documents.parquet'").fetchone()
    ne = con.execute(f"SELECT COUNT(*) FROM '{out}/embeddings.parquet'").fetchone()
    print(f"[gen_scale] {out}: {nd[0]} docs ({nd[1]} chars), {ne[0]} embeddings")


if __name__ == "__main__":
    main()
