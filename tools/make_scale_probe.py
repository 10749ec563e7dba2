#!/usr/bin/env python3
"""Dev tooling only (driver-side python, like compare.py): expand an
existing sf dir N-fold into a probe corpus for SCALING measurements
(VERDICT r10 #5 — validate the 100x-design claims empirically at sf1).

Replication model: N replicas with all PRIMARY/FOREIGN keys remapped
key*N+r, so referential integrity holds and e.g. the co-purchase graph
becomes N disjoint copies (|E| scales exactly N-fold). Dimension tables
(region, nation) keep their fixed TPC-H cardinality. Document text gets
a per-replica token suffix so vocabulary/shingle space scales like a
real corpus instead of degenerating into an N-fold duplicate pile
(which would quadratically explode every near-dup candidate set and
measure degeneracy, not scaling).

Usage: python3 tools/make_scale_probe.py <src_sf_dir> <out_dir> <N>
"""
import sys
import duckdb

src, out, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
con = duckdb.connect()
con.sql(f"CREATE TABLE r AS SELECT range AS r FROM range({n})")

import os
os.makedirs(out, exist_ok=True)

def copy(table, select):
    con.sql(f"COPY ({select}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")
    print(table, con.sql(f"SELECT count(*) FROM read_parquet('{out}/{table}.parquet')").fetchone()[0])

def t(name):
    return f"read_parquet('{src}/{name}.parquet')"

# fixed-cardinality dims: copy through
for d in ("region", "nation"):
    copy(d, f"SELECT * FROM {t(d)}")

copy("customer", f"""
  SELECT c_custkey*{n}+r.r AS c_custkey, c_name, c_nationkey, c_acctbal,
         c_mktsegment
  FROM {t('customer')}, r""")
copy("supplier", f"""
  SELECT s_suppkey*{n}+r.r AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM {t('supplier')}, r""")
copy("part", f"""
  SELECT p_partkey*{n}+r.r AS p_partkey, p_name, p_brand, p_type, p_size,
         p_retailprice
  FROM {t('part')}, r""")
copy("orders", f"""
  SELECT o_orderkey*{n}+r.r AS o_orderkey, o_custkey*{n}+r.r AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM {t('orders')}, r""")
copy("lineitem", f"""
  SELECT l_orderkey*{n}+r.r AS l_orderkey, l_partkey*{n}+r.r AS l_partkey,
         l_suppkey*{n}+r.r AS l_suppkey, l_linenumber,
         l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag,
         l_linestatus, l_shipdate
  FROM {t('lineitem')}, r""")
copy("events", f"""
  SELECT event_id*{n}+r.r AS event_id, ts, user_id*{n}+r.r AS user_id,
         event_type, value, props
  FROM {t('events')}, r""")
# per-replica token suffix => vocabulary scales ~N-fold (see module doc)
copy("documents", f"""
  SELECT doc_id*{n}+r.r AS doc_id,
         CASE WHEN text IS NULL THEN NULL
              ELSE list_aggregate(
                [tok || '_' || r.r for tok in string_split(text, ' ')],
                'string_agg', ' ')
         END AS text,
         lang, source, n_chars
  FROM {t('documents')}, r""")
# label rides through: the kNN-classifier / hard-negative / uncertainty
# queries (q29/q134/q262/q263/q267) resolve it (r12: the probe dropped it
# and those 5 queries failed to even PLAN at sf1)
copy("embeddings", f"""
  SELECT vec_id*{n}+r.r AS vec_id, embedding, label
  FROM {t('embeddings')}, r""")
