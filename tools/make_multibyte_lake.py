#!/usr/bin/env python3
"""Build a multibyte variant of a testdata lake (round-9 non-ASCII sweep).

Only documents.parquet is rewritten — every other table is symlinked, so
physical parquet types (the events TIMESTAMP(NANOS) column!) are
byte-identical. The text transform is deterministic and grows bytes
past codepoints everywhere:

  - 'a' -> 'ä' (2-byte), 'e' -> 'é' (2-byte)   [dense, in-word]
  - docs with doc_id % 7 == 0 get a 'δφ—' prefix (2- and 3-byte chars)

Any gate whose Spark side indexes BYTES where its oracle indexes
CODEPOINTS (or vice versa) — substring windows, shingle offsets,
rolling hashes, n_chars accounting — diverges on this lake and only on
this lake. n_chars is recomputed as the post-transform CODEPOINT count
so the column keeps its meaning.

Usage: make_multibyte_lake.py <src_sf_dir> <dst_dir>
"""
import os, sys
import pyarrow as pa
import pyarrow.parquet as pq

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf0001_mb"

os.makedirs(dst, exist_ok=True)
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def transform(doc_id: int, text: str) -> str:
    t = text.replace("a", "ä").replace("e", "é")
    if doc_id % 7 == 0:
        t = "δφ—" + t
    return t

for t in TABLES:
    s, d = f"{src}/{t}.parquet", f"{dst}/{t}.parquet"
    if os.path.lexists(d):
        os.remove(d)
    if t != "documents":
        os.symlink(s, d)
        continue
    tab = pq.read_table(s)
    ids = tab.column("doc_id").to_pylist()
    texts = tab.column("text").to_pylist()
    new_texts = [transform(i, x) for i, x in zip(ids, texts)]
    new_nchars = [len(x) for x in new_texts]
    cols = {}
    for name in tab.schema.names:
        if name == "text":
            cols[name] = pa.array(new_texts, type=pa.string())
        elif name == "n_chars":
            cols[name] = pa.array(new_nchars, type=pa.int64())
        else:
            cols[name] = tab.column(name)
    out = pa.table(cols)
    pq.write_table(out, d)
    print(f"rewrote {t}: {len(new_texts)} docs, "
          f"{sum(new_nchars)} codepoints, "
          f"{sum(len(x.encode()) for x in new_texts)} bytes")
print("lake at", dst)
