#!/usr/bin/env python3
"""Validate the planned DuckDB deflation CTE chain against the pure-
Python BigInt replay, at one SF dir (argv[1])."""
import sys
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")

rounds1 = ",\n".join(
    f"""w{r} AS MATERIALIZED (SELECT c.i, sum(c.cij * v.v) AS w FROM c JOIN v{r} v ON c.j = v.i GROUP BY 1),
v{r + 1} AS MATERIALIZED (SELECT i, CAST(CAST(w * 1000000 AS HUGEINT) // (SELECT CAST(max(abs(w)) AS HUGEINT) FROM w{r}) AS DECIMAL(38,0)) AS v FROM w{r})"""
    for r in range(6))
rounds2 = ",\n".join(
    f"""x{r} AS MATERIALIZED (SELECT c.i, sum(c.cij * v.v) AS w FROM c2 c JOIN u{r} v ON c.j = v.i GROUP BY 1),
u{r + 1} AS MATERIALIZED (SELECT i, CAST(CAST(w * 1000000 AS HUGEINT) // (SELECT CAST(max(abs(w)) AS HUGEINT) FROM x{r}) AS DECIMAL(38,0)) AS v FROM x{r})"""
    for r in range(80))

sql = f"""WITH f AS (SELECT doc_id,
  CAST(length(text) AS BIGINT) AS f0,
  CAST(len(string_split(text,' ')) AS BIGINT) AS f1,
  CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS f2,
  CAST(length(text) - length(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT) AS f3,
  CAST(list_max(list_transform(string_split(text,' '), t -> length(t))) AS BIGINT) AS f4,
  CAST(len(list_filter(string_split(text,' '), t -> t IN ('the','a','of','and','to','in','is'))) AS BIGINT) AS f5
FROM documents),
q AS MATERIALIZED (SELECT doc_id, unnest(generate_series(0,5)) AS i, unnest([f0,f1,f2,f3,f4,f5]) AS qx FROM f),
nn AS (SELECT count(*) AS n FROM f),
s AS (SELECT i, sum(qx)::DECIMAL(38,0) AS si FROM q GROUP BY i),
p AS (SELECT a.i AS i, b.i AS j, sum(a.qx*b.qx)::DECIMAL(38,0) AS pij FROM q a JOIN q b USING (doc_id) GROUP BY 1,2),
c AS MATERIALIZED (SELECT p.i, p.j, (SELECT n FROM nn)*pij - sa.si*sb.si AS cij
      FROM p JOIN s sa ON p.i = sa.i JOIN s sb ON p.j = sb.i),
v0 AS MATERIALIZED (SELECT i, 1000000::DECIMAL(38,0) AS v FROM range(6) t(i)),
{rounds1},
vv1 AS (SELECT CAST(sum(v*v) AS HUGEINT) AS vv FROM v6),
lam AS (SELECT CAST(CAST((SELECT sum(va.v * c.cij * vb.v)
           FROM c JOIN v6 va ON c.i = va.i JOIN v6 vb ON c.j = vb.i) AS HUGEINT)
         // (SELECT vv FROM vv1) AS DECIMAL(38,0)) AS lam),
c2 AS MATERIALIZED (SELECT c.i, c.j,
      c.cij - CAST(CAST((SELECT lam FROM lam) * va.v * vb.v AS HUGEINT)
        // (SELECT vv FROM vv1) AS DECIMAL(38,0)) AS cij
      FROM c JOIN v6 va ON c.i = va.i JOIN v6 vb ON c.j = vb.i),
u0 AS MATERIALIZED (SELECT i, 1000000::DECIMAL(38,0) AS v FROM range(6) t(i)),
{rounds2}
SELECT 0 AS comp, CAST(v.i AS INT) AS i, CAST(v.v AS BIGINT) AS v,
  CAST(CAST((SELECT sum(va.v * c.cij * vb.v)
             FROM c JOIN v6 va ON c.i = va.i JOIN v6 vb ON c.j = vb.i) * 1000000 AS HUGEINT)
    // CAST((SELECT sum(cij) FROM c WHERE i = j) * (SELECT sum(v*v) FROM v6) AS HUGEINT) AS BIGINT) AS evr_ppm
FROM v6 v
UNION ALL
SELECT 1 AS comp, CAST(u.i AS INT) AS i, CAST(u.v AS BIGINT) AS v,
  CAST(CAST((SELECT sum(va.v * c.cij * vb.v)
             FROM c JOIN u80 va ON c.i = va.i JOIN u80 vb ON c.j = vb.i) * 1000000 AS HUGEINT)
    // CAST((SELECT sum(cij) FROM c WHERE i = j) * (SELECT sum(v*v) FROM u40) AS HUGEINT) AS BIGINT) AS evr_ppm
FROM u80 u ORDER BY comp, i"""

res = con.execute(sql).fetchall()
for r in res:
    print(r)
