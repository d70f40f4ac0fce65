"""Scale-up fixture generator: replicate an sf dir by an integer factor.

The driver fixtures (TESTDATA.md) stop at sf0.1; VERDICT r2 item 7
asks for a one-scale-up smoke to catch accidentally-super-linear
operators that sf0.1 hides. The driver's generator recipe is not
published, so this derives sfN from sf0.1 by KEY-OFFSET REPLICATION,
which preserves exactly the properties a scaling smoke measures:

- join fan-out: every foreign key is offset by the same per-replica
  stride as its dimension's primary key, so selectivities and
  join-output sizes scale linearly;
- distributions: all non-key columns keep their values (dates,
  prices, segments), so group-by cardinalities per replica and skew
  shape are unchanged;
- dedup structure: document texts get a per-replica suffix on EVERY
  token (replica 0 keeps the originals), so shingle/minhash spaces
  are disjoint across replicas -- within-replica near-dup structure
  replicates N times instead of every doc gaining N-1 artificial
  near-identical twins (which would make candidate pairs scale
  quadratically in N and invalidate the smoke);
- embeddings get a tiny per-replica additive shift for the same
  reason (no exact cross-replica ties in ANN top-k);
- events keep their timestamps (N x density, the realistic stream
  scale-up) and are replicated via pyarrow so the source fixture's ts
  physical type (NANOS or MICROS -- both have shipped) is preserved
  byte-for-byte; load_table/read_events_stream detect it either way.

region/nation are geography-bounded dimensions and do not scale,
same as TPC-H.

``--skew F`` additionally concentrates fraction F of all EVENTS rows
on a single hot user_id (0) -- the viral-user shape that pins a
shuffled join or agg on one task at 100 TB. The hot rows are chosen
deterministically (event_id % 100 < F*100), so the skewed fixture is
reproducible and the skew tests (tests/test_skew.py) can assert the
mitigations rebalance it.

Usage: python tools/gen_scale.py [--src /root/testdata/sf0.1]
       [--out scale_data/sf1] [--factor 10] [--skew 0.3]
"""

from __future__ import annotations

import argparse
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq


def _stride(con: duckdb.DuckDBPyConnection, path: str, key: str) -> int:
    return con.execute(f"SELECT max({key}) + 1 FROM '{path}'").fetchone()[0]


def generate(src: str, out: str, factor: int, skew: float = 0.0) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def p(name: str) -> str:
        return os.path.join(src, f"{name}.parquet")

    def write(name: str, select_for_replica) -> None:
        sql = " UNION ALL ".join(select_for_replica(r) for r in range(factor))
        con.execute(f"COPY ({sql}) TO '{os.path.join(out, name + '.parquet')}'"
                    " (FORMAT PARQUET)")
        print(f"{name}: x{factor}")

    # geography-bounded dims: copy, don't scale
    for name in ("region", "nation"):
        con.execute(f"COPY (SELECT * FROM '{p(name)}') TO "
                    f"'{os.path.join(out, name + '.parquet')}' (FORMAT PARQUET)")
        print(f"{name}: copied")

    cust = _stride(con, p("customer"), "c_custkey")
    supp = _stride(con, p("supplier"), "s_suppkey")
    part = _stride(con, p("part"), "p_partkey")
    okey = _stride(con, p("orders"), "o_orderkey")
    doc = _stride(con, p("documents"), "doc_id")
    vec = _stride(con, p("embeddings"), "vec_id")

    write("customer", lambda r: f"""
        SELECT c_custkey + {r * cust} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment FROM '{p("customer")}'""")
    write("supplier", lambda r: f"""
        SELECT s_suppkey + {r * supp} AS s_suppkey, s_name, s_nationkey,
               s_acctbal FROM '{p("supplier")}'""")
    write("part", lambda r: f"""
        SELECT p_partkey + {r * part} AS p_partkey, p_name, p_brand, p_type,
               p_size, p_retailprice FROM '{p("part")}'""")
    write("orders", lambda r: f"""
        SELECT o_orderkey + {r * okey} AS o_orderkey,
               o_custkey + {r * cust} AS o_custkey, o_orderstatus,
               o_totalprice, o_orderdate, o_orderpriority FROM '{p("orders")}'""")
    write("lineitem", lambda r: f"""
        SELECT l_orderkey + {r * okey} AS l_orderkey,
               l_partkey + {r * part} AS l_partkey,
               l_suppkey + {r * supp} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate FROM '{p("lineitem")}'""")
    write("documents", lambda r: (f"""
        SELECT doc_id AS doc_id, text, lang, source, n_chars
        FROM '{p("documents")}'""" if r == 0 else f"""
        SELECT doc_id + {r * doc} AS doc_id,
               regexp_replace(text, '(\\S+)', '\\1r{r}', 'g') AS text,
               lang, source,
               length(regexp_replace(text, '(\\S+)', '\\1r{r}', 'g')) AS n_chars
        FROM '{p("documents")}'"""))
    write("embeddings", lambda r: f"""
        SELECT vec_id + {r * vec} AS vec_id,
               list_transform(embedding, x -> (x + {r} * 1e-4)::FLOAT) AS embedding,
               label FROM '{p("embeddings")}'""")

    # events: pyarrow to preserve the TIMESTAMP(NANOS) physical type
    ev = pq.read_table(p("events"))
    estride = pa.compute.max(ev["event_id"]).as_py() + 1
    ustride = pa.compute.max(ev["user_id"]).as_py() + 1
    replicas = []
    for r in range(factor):
        t = ev.set_column(
            ev.schema.get_field_index("event_id"), "event_id",
            pa.compute.add(ev["event_id"], r * estride))
        t = t.set_column(
            t.schema.get_field_index("user_id"), "user_id",
            pa.compute.add(t["user_id"], r * ustride))
        replicas.append(t)
    allev = pa.concat_tables(replicas)
    if skew > 0:
        # deterministic hot-key injection: fraction `skew` of events on
        # user_id 0 (event_id % 100 < skew*100), the rest untouched
        ev_mod = pa.compute.subtract(
            allev["event_id"],
            pa.compute.multiply(pa.compute.divide(allev["event_id"], 100), 100),
        )  # integer event_id % 100 (pyarrow.compute has no mod kernel)
        hot = pa.compute.less(ev_mod, int(round(skew * 100)))
        uid_type = allev.schema.field("user_id").type
        allev = allev.set_column(
            allev.schema.get_field_index("user_id"),
            "user_id",
            pa.compute.if_else(hot, pa.scalar(0, type=uid_type), allev["user_id"]),
        )
        n_hot = pa.compute.sum(pa.compute.cast(hot, "int64")).as_py()
        print(f"events skew: {n_hot}/{allev.num_rows} rows on user_id 0")
    # modest row groups (64k rows): a single-row-group file cannot be
    # split by the scan, which (a) caps map parallelism at 1 regardless
    # of cluster size and (b) silently disables AQE skew-join splitting
    # -- createSkewPartitionSpecs splits at MAP-OUTPUT boundaries, so a
    # hot partition fed by one map task is unsplittable
    # page CRCs (r11 bitrot axis): future regenerations of the events
    # fixture carry write-side checksums so verified reads can catch
    # mid-file corruption. The DuckDB COPY-written tables above stay
    # CRC-less (COPY exposes no checksum knob) -- a documented limit;
    # the committed scale_data/ predates this flag either way.
    pq.write_table(allev, os.path.join(out, "events.parquet"),
                   row_group_size=65536, write_page_checksum=True)
    print(f"events: x{factor} (ts physical type preserved: {ev.schema.field('ts').type})")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="scale_data/sf1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--skew", type=float, default=0.0,
                    help="fraction of events concentrated on one hot user_id")
    args = ap.parse_args()
    generate(args.src, args.out, args.factor, args.skew)
