#!/usr/bin/env python3
"""Prototype oracles for q_blocklist_filter and q_bitext_margin."""
import sys
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'")

bl = con.execute("""
WITH ph(p, l) AS (VALUES ('table scan', 2), ('slow filter', 2),
                         ('batch window spark', 3), ('key agg row', 3),
                         ('the line sort', 3)),
w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
pos AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i FROM w),
m AS (SELECT doc_id, p FROM pos JOIN ph ON i + l - 1 <= len(ws)
        AND array_to_string(ws[i:i+l-1], ' ') = p)
SELECT doc_id, count(*) AS n_hits, count(DISTINCT p) AS n_phrases
FROM m GROUP BY doc_id ORDER BY doc_id
""").fetchall()
print("blocklist rows:", len(bl), "head:", bl[:5])
print("total hits:", sum(r[1] for r in bl))

mg = con.execute("""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                  vec_id % 2 = 0 AS a FROM embeddings),
pair AS (SELECT x.vec_id AS qa, y.vec_id AS qb,
           CAST(floor(round(list_dot_product(x.v, y.v)
             / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))), 9)
             * 1000000000 + 0.5) AS BIGINT) AS c
         FROM e x JOIN e y ON x.a AND NOT y.a),
ra AS (SELECT qa, qb, c, row_number() OVER (PARTITION BY qa ORDER BY c DESC, qb) AS r
       FROM pair),
rb AS (SELECT qa, qb, c, row_number() OVER (PARTITION BY qb ORDER BY c DESC, qa) AS r
       FROM pair),
sa AS (SELECT qa, sum(c) AS s FROM ra WHERE r <= 4 GROUP BY qa),
sb AS (SELECT qb, sum(c) AS s FROM rb WHERE r <= 4 GROUP BY qb),
cand AS (SELECT ra.qa, ra.qb, ra.c FROM ra WHERE ra.r <= 4),
marg AS (SELECT c2.qa, c2.qb,
           (c2.c * 8 * 1000000) // (sa.s + sb.s) AS margin_q
         FROM cand c2 JOIN sa ON c2.qa = sa.qa JOIN sb ON c2.qb = sb.qb
         WHERE c2.c > 0 AND sa.s + sb.s > 0)
SELECT qa, qb, margin_q FROM marg
ORDER BY margin_q DESC, qa, qb LIMIT 50
""").fetchall()
print("margin rows:", len(mg), "head:", mg[:5])
