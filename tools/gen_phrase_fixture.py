#!/usr/bin/env python3
"""Generate the TRUE-at-scale blocklist phrase fixture.

Writes target/fixtures/phrases_large.parquet: 1.2M two-word phrases of
high-entropy hex (md5("graftphrase" + str(i)) split 16+16), so

  * the parquet file is genuinely larger than Spark's DEFAULT
    autoBroadcastJoinThreshold (10 MB) -- Catalyst's file-source
    sizeInBytes is the on-disk size, so the anchor join in
    TextAnalysis.blocklistHitsTable must be planned as a SHUFFLED join
    with no conf lowering (PlanShapeSpec pins this);
  * phrases never match real corpus text (hex words), so a spec mixes
    in a handful of real bigrams to guarantee hits.

PlanShapeSpec self-heals (generates the identical content via Spark) if
this file is absent, so sbt test never depends on having run this; the
script exists for the documented fixture workflow and for eyeballing
the fixture with DuckDB.
"""
import hashlib
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "target/fixtures/phrases_large.parquet"
DOCS_OUT = sys.argv[2] if len(sys.argv) > 2 else "target/fixtures/docs_large.parquet"
DOCS_SRC = "/root/testdata/sf0.1/documents.parquet"
N = 1_200_000


def write_parts(table, out):
    os.makedirs(out, exist_ok=True)
    rows_per = (table.num_rows + 3) // 4
    for part in range(4):  # 4 files so the scan starts parallel
        pq.write_table(table.slice(part * rows_per, rows_per),
                       os.path.join(out, f"part-{part:05d}.parquet"),
                       compression="snappy")
    size = sum(os.path.getsize(os.path.join(out, f)) for f in os.listdir(out))
    print(f"{out}: {table.num_rows} rows, {size / 1e6:.1f} MB on disk "
          f"({'ABOVE' if size > 10 * 1024 * 1024 else 'BELOW'} the 10 MB default broadcast threshold)")


phrases = []
for i in range(N):
    h = hashlib.md5(b"graftphrase" + str(i).encode()).hexdigest()
    phrases.append(h[:16] + " " + h[16:32])
write_parts(pa.table({"p": phrases}), OUT)

# docs: sf0.1 corpus, each text padded with 128 deterministic hex words
# (same content as PlanShapeSpec's Spark-side self-heal)
docs = pq.read_table(DOCS_SRC, columns=["doc_id", "text"])
padded = []
for doc_id, text in zip(docs.column("doc_id").to_pylist(),
                        docs.column("text").to_pylist()):
    pad = " ".join(
        hashlib.md5(f"graftpad{doc_id}_{i}".encode()).hexdigest()
        for i in range(1, 129))
    padded.append(text + " " + pad)
write_parts(pa.table({"doc_id": docs.column("doc_id"), "text": padded}), DOCS_OUT)
