#!/usr/bin/env python3
"""Generate a local ~sfN dataset (COPIES x sf0.1) for scale-slope
measurement: sf1 (10 copies, the default) or sf10 (100 copies -- the
second scale decade, so slopes can be read across sf0.1 -> sf1 -> sf10
and linear is distinguishable from n log n).

Replicates each sf0.1 table COPIES x with copy-disjoint key spaces so
referential integrity holds (copy i shifts every key by i * key-range of
its referenced table). Graph-shaped queries then see COPIES disjoint
copies of the sf0.1 graph (same diameter -> per-round-bounded loops
should hold flat round counts), and scan/join queries see COPIES x rows.

Document text gets a per-copy AFFINE alphabet map (letter j -> m*j + s
mod 26 with m coprime to 26; copy i uses m = Ms[i // 26], s = i % 26) so
dedup / winnowing / suffix queries get DISTINCT content per copy --
plain copies would multiply near-dup PAIRS quadratically (COPIES^2, not
COPIES) and poison the slope. An affine map is an alphabet permutation,
so per-doc length/repetition structure is preserved exactly while the
312 available maps keep gram spaces pairwise disjoint well past 100
copies. For i < 26 the map degenerates to rot-i -- byte-identical to the
original sf1 generator's output, so regenerated sf1 data stays
comparable with committed sf1 readings. Embedding vectors get a
deterministic per-copy component nudge for the same reason (identical
copies would give every vector COPIES zero-distance neighbours).

Usage: gen_sf1.py [DST] [COPIES]
Output: /root/repo/target/sf1/*.parquet (gitignored scratch) by default;
sf10: gen_sf1.py /root/repo/target/sf10 100
"""
import duckdb
import os
import sys

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/target/sf1"
COPIES = int(sys.argv[2]) if len(sys.argv) > 2 else 10

# multipliers coprime to 26, m=1 first so copies 0-25 stay rot-i
MS = [1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25]
assert COPIES <= 26 * len(MS), "affine map space exhausted"
# The embedding decorrelation (shift (i*17) % 64 + sign lane for i >= 64)
# separates copies 0..127 only: copy i and copy i+128 would be
# byte-identical, re-planting the cosine-1.0 cross-copy dups the
# orthogonal transform exists to remove. Fail loudly before that scale.
assert COPIES <= 128, "embedding decorrelation aliases at copy 128+ (add a lane)"

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

def src(t):
    return f"read_parquet('{SRC}/{t}.parquet')"

def gen(table, sql):
    con.execute(f"COPY ({sql}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/{table}.parquet')").fetchone()[0]
    print(f"{table}: {n} rows")

# fixed dims: copied as-is (25 nations / 5 regions at every TPC-H SF)
for t in ("region", "nation"):
    gen(t, f"SELECT * FROM {src(t)}")

# key ranges of sf0.1 (max key + 1), read once
R = {t: con.execute(f"SELECT max({k}) + 1 FROM {src(t)}").fetchone()[0]
     for t, k in [("customer", "c_custkey"), ("supplier", "s_suppkey"),
                  ("part", "p_partkey"), ("orders", "o_orderkey"),
                  ("events", "event_id"), ("documents", "doc_id"),
                  ("embeddings", "vec_id")]}
UIDR = con.execute(f"SELECT max(user_id) + 1 FROM {src('events')}").fetchone()[0]

copies = "(SELECT unnest(range(0, %d)) AS i)" % COPIES

gen("customer", f"""
  SELECT c_custkey + i * {R['customer']} AS c_custkey, c_name, c_nationkey,
         c_acctbal, c_mktsegment
  FROM {src('customer')}, {copies}""")

gen("supplier", f"""
  SELECT s_suppkey + i * {R['supplier']} AS s_suppkey, s_name, s_nationkey,
         s_acctbal
  FROM {src('supplier')}, {copies}""")

gen("part", f"""
  SELECT p_partkey + i * {R['part']} AS p_partkey, p_name, p_brand, p_type,
         p_size, p_retailprice
  FROM {src('part')}, {copies}""")

gen("orders", f"""
  SELECT o_orderkey + i * {R['orders']} AS o_orderkey,
         o_custkey + i * {R['customer']} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM {src('orders')}, {copies}""")

gen("lineitem", f"""
  SELECT l_orderkey + i * {R['orders']} AS l_orderkey,
         l_partkey + i * {R['part']} AS l_partkey,
         l_suppkey + i * {R['supplier']} AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM {src('lineitem')}, {copies}""")

gen("events", f"""
  SELECT event_id + i * {R['events']} AS event_id, ts,
         user_id + i * {UIDR} AS user_id, event_type, value, props
  FROM {src('events')}, {copies}""")

# affine alphabet map per copy keeps copies' gram spaces disjoint
# (copy i: letter j -> MS[i // 26] * j + (i % 26) mod 26; i < 26 = rot-i)
def affine_alphabet(i):
    m, s = MS[i // 26], i % 26
    return "".join(chr(ord("a") + (m * j + s) % 26) for j in range(26))

rot_whens = " ".join(
    f"WHEN {i} THEN translate(text, 'abcdefghijklmnopqrstuvwxyz', "
    f"'{affine_alphabet(i)}')"
    for i in range(1, COPIES))
ROT = f"CASE i WHEN 0 THEN text {rot_whens} END" if COPIES > 1 else "text"
gen("documents", f"""
  SELECT doc_id + i * {R['documents']} AS doc_id, {ROT} AS text, lang,
         source, n_chars
  FROM {src('documents')}, {copies}""")

# Per-copy ORTHOGONAL transform (round 16; replaces the r15 additive
# nudge): cyclic component shift by (i*17) mod d, plus an odd-component
# sign flip for i >= d. The r15 nudge left cross-copy cosine ~0.998
# (measured), so every vector had COPIES planted near-dups and every
# cosine-threshold operator's OUTPUT grew quadratically in copies --
# the exact artifact the nudge was meant to prevent (SCALE_DECADE r16:
# q_srp_lsh_scaled read slope2 187x purely from the planted pairs).
# An orthogonal transform preserves all WITHIN-copy geometry exactly
# (every dot product, norm, and neighbour rank identical to sf0.1 --
# the vector analog of the text affine alphabet map) while cross-copy
# cosine drops to ~0 for generic vectors; 17 coprime to d=64 makes
# shifts distinct for i within 0..63 and the sign lane separates
# i from i+64. Copy 0 is the identity -- byte-identical to sf0.1.
gen("embeddings", f"""
  SELECT vec_id + i * {R['embeddings']} AS vec_id,
         CAST(list_transform(range(1, len(embedding) + 1),
              j -> embedding[((j - 1 + (i * 17) % len(embedding))
                               % len(embedding)) + 1]
                   * (CASE WHEN i >= len(embedding) AND j % 2 = 1
                      THEN -1 ELSE 1 END)) AS FLOAT[])
           AS embedding,
         label
  FROM {src('embeddings')}, {copies}""")

print("done ->", DST)
