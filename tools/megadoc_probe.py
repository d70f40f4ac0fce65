"""Megabyte-document scaling probe for the text/dedup operator family.

The gate fixtures carry short documents (~1 KB); real pretraining
corpora carry pages of 100 KB-10 MB. A per-row blowup that is
invisible at fixture length (quadratic string ops, per-element
re-evaluation over huge arrays, collect_list of megabyte payloads)
only shows at this length. This probe times each operator stage on a
fixed doc COUNT at growing doc LENGTH and reports the scaling ratio:
linear operators stay near len_ratio, a trap shows super-linear
growth or an executor OOM.

Usage: python tools/megadoc_probe.py [--docs 32] [--lens 65536,262144,1048576]
Prints one JSON line per (stage, length) with wall seconds, then a
verdict table of length-scaling ratios.
"""
from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def make_corpus(spark, n_docs: int, doc_len: int):
    """Deterministic synthetic prose: repeated vocabulary words with
    per-doc drift so dedup stages see realistic shingle overlap."""
    rng = random.Random(42)
    vocab = [
        "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(rng.randint(3, 9)))
        for _ in range(2000)
    ]
    rows = []
    for d in range(n_docs):
        r = random.Random(1000 + d)
        words = []
        size = 0
        while size < doc_len:
            w = vocab[r.randrange(len(vocab))]
            words.append(w)
            size += len(w) + 1
        rows.append((d, " ".join(words)))
    return spark.createDataFrame(rows, "doc_id bigint, text string").repartition(8)


def stages():
    """(name, fn(df) -> DataFrame-to-count) for each text/dedup stage
    that touches the raw text column."""
    from etl_upc_syllabus_spark.operators import dedup as dd
    from etl_upc_syllabus_spark.operators import textanalysis as ta
    from etl_upc_syllabus_spark.operators import curation as cu

    def s_tokens(df):
        return df.select(ta.token_count("text").alias("n"))

    def s_bpe(df):
        return df.select(ta.bpe_token_count("text").alias("n"))

    def s_quality(df):
        m = ta.quality_metrics("text")
        return df.select(*[v.alias(k) for k, v in m.items()])

    def s_langid(df):
        return df.select(ta.lang_id("text").alias("l"))

    def s_fingerprint(df):
        return df.select(ta.fingerprint("text").alias("fp"))

    def s_char_shingles(df):
        return df.select(F.size(ta.char_shingles("text")).alias("n"))

    def s_shingle_sets(df):
        return dd.shingle_sets(df, "doc_id", "text").select(
            "id", F.size("ss").alias("n")
        )

    def s_minhash(df):
        sh = dd.shingle_sets(df, "doc_id", "text")
        return dd.minhash_signatures(sh)

    def s_simhash(df):
        return dd.simhash_signatures(df, "doc_id", "text")

    def s_gopher(df):
        m = cu.repetition_metrics("text")
        return df.select("doc_id", *[v.alias(k) for k, v in m.items()])

    return [
        ("token_count", s_tokens),
        ("bpe_token_count", s_bpe),
        ("quality_metrics", s_quality),
        ("lang_id", s_langid),
        ("fingerprint", s_fingerprint),
        ("char_shingles", s_char_shingles),
        ("shingle_sets", s_shingle_sets),
        ("minhash_signatures", s_minhash),
        ("simhash", s_simhash),
        ("gopher_repetition", s_gopher),
    ]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=32)
    ap.add_argument("--lens", default="65536,262144,1048576")
    ap.add_argument("--only", default=None, help="comma list of stage names")
    args = ap.parse_args()
    lens = [int(x) for x in args.lens.split(",")]

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "12g")
        .config("spark.ui.showConsoleProgress", "false")
        .appName("megadoc-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    picked = stages()
    if args.only:
        names = set(args.only.split(","))
        picked = [s for s in picked if s[0] in names]

    results: dict[str, dict[int, float]] = {}
    for doc_len in lens:
        t0 = time.time()
        df = make_corpus(spark, args.docs, doc_len)
        df.persist().count()
        print(
            json.dumps({"stage": "_corpus_build", "len": doc_len, "sec": round(time.time() - t0, 2)}),
            flush=True,
        )
        for name, fn in picked:
            t0 = time.time()
            try:
                out = fn(df)
                # .count() alone lets Catalyst prune the projected
                # expressions (column pruning makes the probe vacuous);
                # hashing every output column forces full evaluation
                row = (
                    out.select(
                        F.xxhash64(F.struct(*[F.col(c) for c in out.columns])).alias("h")
                    )
                    .agg(F.count("*").alias("n"), F.expr("bit_xor(h)").alias("chk"))
                    .collect()[0]
                )
                n = row["n"]
                sec = time.time() - t0
                print(
                    json.dumps({"stage": name, "len": doc_len, "rows": n, "sec": round(sec, 2)}),
                    flush=True,
                )
                results.setdefault(name, {})[doc_len] = sec
            except Exception as e:  # noqa: BLE001 - probe must report, not die
                print(
                    json.dumps({"stage": name, "len": doc_len, "err": str(e)[:200]}),
                    flush=True,
                )
        df.unpersist()

    # verdict: per-stage ratio of wall time across the length sweep,
    # compared to the length ratio itself
    if len(lens) >= 2:
        len_ratio = lens[-1] / lens[0]
        print(f"\n== scaling verdict (len x{len_ratio:.0f}) ==", flush=True)
        bad = 0
        for name, times in results.items():
            if lens[0] in times and lens[-1] in times and times[lens[0]] > 0:
                r = times[lens[-1]] / times[lens[0]]
                flag = "OK" if r < 3 * len_ratio else "SUPER-LINEAR"
                if flag != "OK":
                    bad += 1
                print(f"{name:22s} {times[lens[0]]:7.2f}s -> {times[lens[-1]]:7.2f}s  x{r:6.1f}  {flag}", flush=True)
        return 1 if bad else 0
    return 0


if __name__ == "__main__":
    sys.exit(main())
