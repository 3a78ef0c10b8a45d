#!/usr/bin/env python3
"""Prototype: integer PCA with rank-1 deflation (PC2), pure-Python BigInt
replay of the planned Scala, cross-checked against a DuckDB HUGEINT CTE.
Run at sf0.001/sf0.01/sf0.1 before writing Scala."""
import sys
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")

STOP = "('the','a','of','and','to','in','is')"
feats = con.execute(f"""
SELECT doc_id,
  CAST(length(text) AS BIGINT),
  CAST(len(string_split(text,' ')) AS BIGINT),
  CAST(len(list_distinct(string_split(text,' '))) AS BIGINT),
  CAST(length(text) - length(regexp_replace(text,'[aeiou]','','g')) AS BIGINT),
  CAST(list_max(list_transform(string_split(text,' '), t -> length(t))) AS BIGINT),
  CAST(len(list_filter(string_split(text,' '), t -> t IN {STOP})) AS BIGINT)
FROM documents""").fetchall()

D = 6
n = len(feats)
rows = [list(r[1:]) for r in feats]
s = [sum(r[i] for r in rows) for i in range(D)]
p = [[sum(r[i] * r[j] for r in rows) for j in range(D)] for i in range(D)]
c = [[n * p[i][j] - s[i] * s[j] for j in range(D)] for i in range(D)]
SCALE = 10**6


def trunc_div(a, b):
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def power(mat, rounds=6):
    v = [SCALE] * D
    for _ in range(rounds):
        w = [sum(mat[i][j] * v[j] for j in range(D)) for i in range(D)]
        m = max(abs(x) for x in w)
        v = [trunc_div(x * SCALE, m) for x in w]
    return v


def evr(mat_orig, v):
    num = sum(v[i] * mat_orig[i][j] * v[j] for i in range(D) for j in range(D))
    tr = sum(mat_orig[i][i] for i in range(D))
    vv = sum(x * x for x in v)
    return trunc_div(num * 10**6, tr * vv)


v1 = power(c)
vv1 = sum(x * x for x in v1)
num1 = sum(v1[i] * c[i][j] * v1[j] for i in range(D) for j in range(D))
lam = trunc_div(num1, vv1)
c2 = [[c[i][j] - trunc_div(lam * v1[i] * v1[j], vv1) for j in range(D)]
      for i in range(D)]
v2 = power(c2)
v2_extra = power(c2, 7)
v1_extra = power(c, 7)
dot = sum(v1[i] * v2[i] for i in range(D))
print("n", n)
print("v1", v1, "evr", evr(c, v1))
print("v2", v2, "evr", evr(c, v2))
print("fixed-point v1 (7==6):", v1_extra == v1, v1_extra)
print("fixed-point v2 (7==6):", v2_extra == v2, v2_extra)
print("orthogonality dot/scale:", dot, "rel", abs(dot) / (vv1))
# magnitudes for HUGEINT bounds
print("max|c|", max(abs(x) for r in c for x in r))
print("num1", num1, "lam", lam, "max lam*v*v", abs(lam) * max(abs(x) for x in v1) ** 2)
