"""Synthesize a deterministic sf1 dataset (10x sf0.1) for scale-exponent
benchmarking (round-3 VERDICT #1).

No external data and no driver generator at sf1 exist in this sandbox, so
sf1 is built by TILING sf0.1 ten times with disjoint id offsets — every
copy keeps the per-copy distributional shape (degree structure, value
histograms), giving an honest 10x input volume. Disclosures:

- graph workloads see 10 disjoint copies of the sf0.1 graph (no cross-copy
  edges): per-copy topology identical, total |V|,|E| 10x;
- document texts get a per-copy suffix token so exact/near-dup volume scales
  ~linearly instead of exploding into 10-clone groups (a data artifact, not
  engine behavior);
- embedding dim0 is perturbed by copy*1e-3 to break exact ANN ties.

Output: <repo>/testdata_big/sf1/*.parquet (gitignored).
"""

import os

import duckdb

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "testdata_big", "sf1")
COPIES = 10
# offsets: one round power-of-10 above each table's max id at sf0.1
OFF = {
    "o_orderkey": 10_000_000, "o_custkey": 100_000,
    "l_orderkey": 10_000_000, "l_partkey": 1_000_000, "l_suppkey": 10_000,
    "c_custkey": 100_000, "s_suppkey": 10_000, "p_partkey": 1_000_000,
    "doc_id": 100_000, "vec_id": 100_000, "event_id": 10_000_000,
    "user_id": 1_000_000,
}


def main():
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW copies AS SELECT unnest(range({COPIES})) AS cp")
    plans = {
        "orders": "SELECT o_orderkey + cp*{o} AS o_orderkey, o_custkey + cp*{c} AS o_custkey, "
                  "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM t, copies"
                  .format(o=OFF["o_orderkey"], c=OFF["o_custkey"]),
        "lineitem": "SELECT l_orderkey + cp*{o} AS l_orderkey, l_partkey + cp*{p} AS l_partkey, "
                    "l_suppkey + cp*{s} AS l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
                    "l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate FROM t, copies"
                    .format(o=OFF["l_orderkey"], p=OFF["l_partkey"], s=OFF["l_suppkey"]),
        "customer": "SELECT c_custkey + cp*{c} AS c_custkey, c_name, c_nationkey, c_acctbal, "
                    "c_mktsegment FROM t, copies".format(c=OFF["c_custkey"]),
        "supplier": "SELECT s_suppkey + cp*{s} AS s_suppkey, s_name, s_nationkey, s_acctbal "
                    "FROM t, copies".format(s=OFF["s_suppkey"]),
        "part": "SELECT p_partkey + cp*{p} AS p_partkey, p_name, p_brand, p_type, p_size, "
                "p_retailprice FROM t, copies".format(p=OFF["p_partkey"]),
        "documents": "SELECT doc_id + cp*{d} AS doc_id, "
                     "CASE WHEN cp = 0 THEN text ELSE text || ' tile' || cp END AS text, "
                     "lang, source, n_chars FROM t, copies".format(d=OFF["doc_id"]),
        "embeddings": "SELECT vec_id + cp*{v} AS vec_id, "
                      "list_prepend(CAST(embedding[1] + cp*0.001 AS FLOAT), embedding[2:]) AS embedding, "
                      "label FROM t, copies".format(v=OFF["vec_id"]),
        "events": "SELECT event_id + cp*{e} AS event_id, ts, user_id + cp*{u} AS user_id, "
                  "event_type, value, props FROM t, copies"
                  .format(e=OFF["event_id"], u=OFF["user_id"]),
        "nation": "SELECT * FROM t",
        "region": "SELECT * FROM t",
    }
    for table, sql in plans.items():
        con.execute(f"CREATE OR REPLACE VIEW t AS SELECT * FROM read_parquet('{SRC}/{table}.parquet')")
        out = os.path.join(DST, f"{table}.parquet")
        con.execute(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    main()
