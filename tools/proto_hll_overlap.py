#!/usr/bin/env python3
"""Prototype oracle for q_hll_overlap: lang-pair trigram-set overlap via
HLL register max-merge + inclusion-exclusion, exact twin alongside."""
import sys
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")

# 60-bit md5 hash identical to Dedup.md5Hash60 / duckHash60
H = "CAST(('0x' || substr(md5('hll:' || t), 1, 15)) AS BIGINT)"
m = 1024
alphaM2 = 0.7213 / (1.0 + 1.079 / m) * m * m
bitcase = "CASE " + " ".join(
    f"WHEN (h>>10) >= {1 << (b - 1)} THEN {b}" for b in range(50, 0, -1)) + " ELSE 0 END"

est = f"""round(CASE WHEN {alphaM2} / s <= 2560.0 AND v > 0
    THEN 1024.0 * ln(1024.0 / v) ELSE {alphaM2} / s END, 6)"""

sql = f"""WITH toks AS (SELECT lang, string_split(text, ' ') AS w FROM documents),
sh AS (SELECT lang, list_distinct(list_transform(
         generate_series(1, greatest(len(w)-2, 1)),
         i -> array_to_string(w[i:i+2], ' '))) AS s FROM toks),
tok AS (SELECT lang, unnest(s) AS t FROM sh),
h AS (SELECT lang, {H} AS h FROM tok),
r AS (SELECT lang, h & 1023 AS bucket, least(30, 51 - {bitcase}) AS rho FROM h),
regs AS (SELECT lang, bucket, max(rho) AS mj FROM r GROUP BY 1, 2),
gp AS (SELECT a.lang AS ga, b.lang AS gb
       FROM (SELECT DISTINCT lang FROM regs) a, (SELECT DISTINCT lang FROM regs) b
       WHERE a.lang < b.lang),
tagged AS (SELECT gp.ga, gp.gb, regs.bucket, regs.mj
           FROM regs JOIN gp ON regs.lang = gp.ga OR regs.lang = gp.gb),
uregs AS (SELECT ga, gb, bucket, max(mj) AS mj FROM tagged GROUP BY 1, 2, 3),
pere AS (SELECT lang, CAST(s_used + CAST(1024 - nb AS DECIMAL(38,30)) AS DOUBLE) AS s,
           1024 - nb AS v FROM (
           SELECT lang, count(*) AS nb,
             sum(CAST(pow(0.5, mj) AS DECIMAL(38,30))) AS s_used
           FROM regs GROUP BY lang)),
pest AS (SELECT lang, {est} AS e FROM pere),
uest0 AS (SELECT ga, gb, CAST(s_used + CAST(1024 - nb AS DECIMAL(38,30)) AS DOUBLE) AS s,
            1024 - nb AS v FROM (
            SELECT ga, gb, count(*) AS nb,
              sum(CAST(pow(0.5, mj) AS DECIMAL(38,30))) AS s_used
            FROM uregs GROUP BY ga, gb)),
uest AS (SELECT ga, gb, {est} AS e FROM uest0),
ex AS (SELECT a.ga, a.gb, count(DISTINCT a.t) AS exact_overlap FROM
        (SELECT gp.ga, gp.gb, tok.t FROM tok JOIN gp ON tok.lang = gp.ga) a
        JOIN (SELECT gp.ga, gp.gb, tok.t FROM tok JOIN gp ON tok.lang = gp.gb) b
        ON a.ga = b.ga AND a.gb = b.gb AND a.t = b.t
        GROUP BY a.ga, a.gb)
SELECT gp.ga, gp.gb, pa.e AS est_a, pb.e AS est_b, u.e AS est_union,
  pa.e + pb.e - u.e AS est_overlap,
  COALESCE(ex.exact_overlap, 0) AS exact_overlap
FROM gp JOIN pest pa ON gp.ga = pa.lang JOIN pest pb ON gp.gb = pb.lang
  JOIN uest u ON gp.ga = u.ga AND gp.gb = u.gb
  LEFT JOIN ex ON gp.ga = ex.ga AND gp.gb = ex.gb
ORDER BY gp.ga, gp.gb"""
for row in con.execute(sql).fetchall():
    print(row)
