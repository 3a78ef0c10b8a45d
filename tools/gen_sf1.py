#!/usr/bin/env python3
"""Derive a 10x "sf1" dataset from the sf0.1 fixtures for the scaling run.

Each copy i in 0..9 shifts every key space by a copy-specific offset and
SALTS document content (every word suffixed with the copy tag) so the ten
copies are content-disjoint: near-dup/similarity operators see a corpus
that is 10x LARGER, not 10x DUPLICATED — each copy carries the same
intra-copy duplicate structure as sf0.1, which is what honest scaling
ratios need. Graph tables become ten disjoint subgraphs of the sf0.1
shape. One parquet file per copy so Spark's scan starts 10-way parallel,
matching the multi-executor layout the engine targets.

Usage: python3 tools/gen_sf1.py [out_dir]   (default /root/repo/target/sf1)
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/target/sf1"
COPIES = 10

con = duckdb.connect()

def gen(table, select_tpl):
    d = os.path.join(OUT, f"{table}.parquet")
    os.makedirs(d, exist_ok=True)
    for i in range(COPIES):
        con.execute(
            f"COPY ({select_tpl.format(i=i, src=f'{SRC}/{table}.parquet')}) "
            f"TO '{d}/part-{i:02d}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
    print(f"{table}: {n} rows -> {d}")

gen("documents", """
  SELECT doc_id + {i} * 10000000 AS doc_id,
         array_to_string(list_transform(string_split(text, ' '),
           w -> w || '_c{i}'), ' ') AS text,
         lang, source, n_chars
  FROM '{src}'""")

gen("embeddings", """
  SELECT vec_id + {i} * 10000000 AS vec_id,
         list_concat(embedding[{i}+1:], embedding[:{i}]) AS embedding,
         label
  FROM '{src}'""")

gen("orders", """
  SELECT o_orderkey + {i} * 100000000 AS o_orderkey,
         o_custkey + {i} * 10000000 AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{src}'""")

gen("lineitem", """
  SELECT l_orderkey + {i} * 100000000 AS l_orderkey,
         l_partkey + {i} * 10000000 AS l_partkey,
         l_suppkey + {i} * 1000000 AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM '{src}'""")

gen("customer", """
  SELECT c_custkey + {i} * 10000000 AS c_custkey,
         c_name, c_nationkey, c_acctbal, c_mktsegment
  FROM '{src}'""")

gen("supplier", """
  SELECT s_suppkey + {i} * 1000000 AS s_suppkey,
         s_name, s_nationkey, s_acctbal
  FROM '{src}'""")

gen("part", """
  SELECT p_partkey + {i} * 10000000 AS p_partkey,
         p_name, p_brand, p_type, p_size, p_retailprice
  FROM '{src}'""")

gen("events", """
  SELECT event_id + {i} * 100000000 AS event_id,
         ts, user_id + {i} * 10000000 AS user_id,
         event_type, value, props
  FROM '{src}'""")

# shared dimensions: nation keys are referenced unshifted from every copy's
# customers/suppliers, so these two stay single-copy
for t in ("nation", "region"):
    d = os.path.join(OUT, f"{t}.parquet")
    os.makedirs(d, exist_ok=True)
    con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                f"TO '{d}/part-00.parquet' (FORMAT PARQUET)")
    print(f"{t}: copied (shared dim)")
