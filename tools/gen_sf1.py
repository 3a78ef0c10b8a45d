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
