#!/usr/bin/env python3
"""Generate a 10x (sf1-equivalent) dataset at /tmp/sf1 from sf0.1.

Scaling-pass tooling only (driver-side, like tools/check.py) -- the
library never reads this path unless SPARK_GRAFT_SF_DIR points at it.

Design: the linearity test needs 10x the ROWS with the SAME
distribution shape, so
  - relational tables (lineitem/orders/customer/part) are 10 key-shifted
    replicas of sf0.1: per-key degrees are exactly preserved (a part
    keeps its basket df, an order keeps its line count) while key
    cardinality and rows scale 10x -- the correct null hypothesis for
    "work is linear in rows".
  - documents/embeddings/events are generated FRESH with the measured
    sf0.1 distributions (identical text replicas would fabricate
    10-copy duplicate clusters and quadratic pair output that the real
    corpus does not have).
  - supplier/nation/region are fixed dimensions -- copied as-is.

Deterministic: seed 7. Run: python3 tools/gen_sf1.py [outdir]
"""
import os
import shutil
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
R = 10  # replicas / scale factor vs sf0.1
rng = np.random.default_rng(7)

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()

# --- replicated relational tables (key-shifted, degree-preserving) ---
OFF = {"order": 150000, "cust": 15000, "part": 20000, "supp": 2000}
reps = " UNION ALL ".join(
    f"""SELECT l_orderkey + {i * OFF['order']} AS l_orderkey,
          l_partkey + {i * OFF['part']} AS l_partkey,
          l_suppkey + {i * OFF['supp']} AS l_suppkey,
          l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
          l_returnflag, l_linestatus, l_shipdate
        FROM '{SRC}/lineitem.parquet'""" for i in range(R))
con.execute(f"COPY ({reps}) TO '{OUT}/lineitem.parquet' (FORMAT PARQUET)")

reps = " UNION ALL ".join(
    f"""SELECT o_orderkey + {i * OFF['order']} AS o_orderkey,
          o_custkey + {i * OFF['cust']} AS o_custkey,
          o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{SRC}/orders.parquet'""" for i in range(R))
con.execute(f"COPY ({reps}) TO '{OUT}/orders.parquet' (FORMAT PARQUET)")

reps = " UNION ALL ".join(
    f"""SELECT c_custkey + {i * OFF['cust']} AS c_custkey, c_name,
          c_nationkey, c_acctbal, c_mktsegment
        FROM '{SRC}/customer.parquet'""" for i in range(R))
con.execute(f"COPY ({reps}) TO '{OUT}/customer.parquet' (FORMAT PARQUET)")

reps = " UNION ALL ".join(
    f"SELECT * REPLACE (p_partkey + {i * OFF['part']} AS p_partkey) "
    f"FROM '{SRC}/part.parquet'" for i in range(R))
con.execute(f"COPY ({reps}) TO '{OUT}/part.parquet' (FORMAT PARQUET)")

for t in ("supplier", "nation", "region"):
    shutil.copy(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")

# --- documents: fresh word salad, measured sf0.1 distributions ---
# Vocabulary must scale with the corpus (Heaps' law): sf0.1's 31 words
# give a 31^3 ~ 30k trigram-shingle space that 5k docs fill to an
# average shingle df of ~9. Keeping that vocab at 10x the docs would
# SATURATE the shingle space and push df (and the exact-Jaccard
# candidate space, which is inherently sum-of-df^2) up linearly with
# the corpus -- a data artifact, not an operator property. Scaling the
# vocab by cbrt(10) (31 -> 67) scales the shingle space 10x and keeps
# the df distribution at its sf0.1 shape.
base_vocab = [r[0] for r in con.execute(
    f"SELECT DISTINCT unnest(string_split(text, ' ')) AS w "
    f"FROM '{SRC}/documents.parquet' ORDER BY 1").fetchall()]
vocab = (base_vocab + [w + "x" for w in base_vocab]
         + [w + "q" for w in base_vocab[:5]])  # 31*2+5 = 67
langs, lang_p = zip(*[(r[0], r[1]) for r in con.execute(
    f"SELECT lang, count(*) FROM '{SRC}/documents.parquet' "
    "GROUP BY 1 ORDER BY 1").fetchall()])
lang_p = np.array(lang_p) / sum(lang_p)
n_docs = 5000 * R
lens = rng.integers(10, 101, n_docs)
words = rng.integers(0, len(vocab), lens.sum())
texts, pos = [], 0
for ln in lens:
    texts.append(" ".join(vocab[w] for w in words[pos:pos + ln]))
    pos += ln
doc_lang = rng.choice(langs, n_docs, p=lang_p)
tbl = pa.table({
    "doc_id": pa.array(np.arange(n_docs), pa.int64()),
    "text": pa.array(texts),
    "lang": pa.array(doc_lang),
    "source": pa.array([f"src{i % 20}" for i in rng.integers(0, 20, n_docs)]),
    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
})
pq.write_table(tbl, f"{OUT}/documents.parquet")

# --- embeddings: fresh unit-normalized 64-dim float32 (matches the
# measured sf0.1 shape: component stddev 1/8 = 1/sqrt(64)) ---
n_vec = 2000 * R
v = rng.standard_normal((n_vec, 64)).astype(np.float32)
v /= np.linalg.norm(v, axis=1, keepdims=True)
tbl = pa.table({
    "vec_id": pa.array(np.arange(n_vec), pa.int64()),
    "embedding": pa.array(list(v), pa.list_(pa.float32())),
    "label": pa.array(rng.integers(0, 10, n_vec), pa.int32()),
})
pq.write_table(tbl, f"{OUT}/embeddings.parquet")

# --- events: fresh; 10x users x same per-user event count, same
# 30-day span (so sessions per user and join-window densities match) ---
n_ev = 100000 * R
t0 = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
t1 = np.datetime64("2024-01-31T00:00:00", "us").astype(np.int64)
ts = np.sort(rng.integers(t0, t1, n_ev))
tbl = pa.table({
    "event_id": pa.array(np.arange(n_ev), pa.int64()),
    "ts": pa.array(ts, pa.timestamp("us")),
    "user_id": pa.array(rng.integers(0, 1500 * R, n_ev), pa.int64()),
    "event_type": pa.array(
        rng.choice(["view", "click", "purchase", "signup", "error"], n_ev)),
    "value": pa.array(np.round(rng.uniform(0, 560, n_ev), 2), pa.float64()),
    "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)]),
})
pq.write_table(tbl, f"{OUT}/events.parquet")

for t in ("lineitem", "orders", "customer", "part", "documents",
          "embeddings", "events"):
    n = pq.read_metadata(f"{OUT}/{t}.parquet").num_rows
    print(f"{t}: {n}")
print(f"done -> {OUT}")
