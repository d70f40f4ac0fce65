"""BENCH_FLOORS.json maintenance: era metadata + recent-era floors
(VERDICT r10 item 6).

Floors are per-query minima used two ways that were conflated before
r11:

- **the ledger** (``floors``): the all-time minimum ever recorded for
  a query at sf0.1 -- the number BASELINE.md narrates against. It only
  ratchets down, and it keeps quiet-era records forever.
- **the wobble trigger**: ``bench.py`` probes any suite reading >1.25x
  its floor. Keyed to the ALL-TIME floor on a host that has drifted
  busier, the trigger fires ever more often on pure era drift (r10
  fired 3/15 with zero plan changes). The trigger now keys to
  ``recent_floors`` -- the per-query min over the LAST 3 round
  artifacts -- which tracks the current host era while the ledger
  stays put.

This tool regenerates the artifact from the round artifacts
(bench_history/BENCH_r*.json + root BENCH_r*.json):

- readings come from each artifact's ``parsed.queries`` (bench.py's
  min-of-N warm protocol);
- an artifact with ``parsed: null`` (the r9 tail-window overflow) is
  tail-scraped: every scalar or sample-array value the 2000-char tail
  still carries for a known suite query, min-folded -- consistent with
  ``timings[name] = min(runs)``;
- ``floors`` min-merges the committed ledger (which already carries
  two r9 quiet-window runs whose raw artifacts were never committed)
  with every round reading, so it can only ratchet down;
- ``floor_era`` records, per query, WHICH round produced the ledger
  floor and that round's preflight loadavg -- the era context the
  r10 wobble postmortems had to reconstruct by hand. A ledger floor
  no round artifact reproduces is attributed to the pre-v2 manual
  merge (``round: null``);
- ``recent_floors`` / ``recent_rounds`` carry the trigger era.

Usage: python tools/floors.py [--write]   (default: print, no write)
"""

from __future__ import annotations

import json
import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
#: how many most-recent rounds define the wobble-trigger era
RECENT_WINDOW = 3


def _round_artifacts() -> list[tuple[str, str]]:
    """[(round_tag, path)] for every per-round sf0.1 artifact, both
    archived (bench_history/) and current (repo root), in ROUND order
    (sorted on the integer, not the zero-padded tag -- 'r100' must not
    land between 'r10' and 'r11'; review r11)."""
    out: dict[int, str] = {}
    for d in (os.path.join(_REPO, "bench_history"), _REPO):
        if not os.path.isdir(d):
            continue
        for fn in sorted(os.listdir(d)):
            m = re.fullmatch(r"BENCH_r(\d+)\.json", fn)
            if m:
                # root wins over history for the same round (it is the
                # freshest copy; contents are identical in practice)
                out[int(m.group(1))] = os.path.join(d, fn)
    return [(f"r{n:02d}", out[n]) for n in sorted(out)]


def _scrape_tail(tail: str, known: set[str]) -> dict[str, float]:
    """Best-effort per-query minima from a truncated artifact tail.
    Scalars ("name": 1.23) and sample arrays ("name": [1.2, 1.1]) are
    min-folded per known query name; unknown names (cold floors, meta
    fields like "value") are ignored."""
    vals: dict[str, float] = {}

    def fold(name: str, xs: list[float]) -> None:
        if name in known and xs:
            v = min(xs)
            vals[name] = min(vals.get(name, v), v)

    for m in re.finditer(r'"([a-z0-9_]+)":\s*(\d+\.\d+)', tail):
        fold(m.group(1), [float(m.group(2))])
    for m in re.finditer(r'"([a-z0-9_]+)":\s*\[([\d.,\s]+)\]', tail):
        fold(
            m.group(1),
            [float(x) for x in m.group(2).split(",") if x.strip()],
        )
    return vals


def _readings(path: str, known: set[str] | None) -> tuple[dict[str, float], list[float] | None]:
    """(per-query floor readings, preflight loadavg) for one artifact.
    ``known`` gates only the TAIL-SCRAPE path (it cannot tell a query
    key from a meta field without a name list); a parsed artifact's
    ``queries`` dict is authoritative and is taken whole, so a query
    added to the bench suite acquires a floor on the next regeneration
    without this tool needing a code change (review r11)."""
    with open(path, encoding="utf-8") as fh:
        rec = json.load(fh)
    parsed = rec.get("parsed")
    # cold-mode artifacts also carry a "queries" dict -- of COLD
    # timings. Folding those into the warm floors would poison the
    # ledger, and standalone --cold numbers are not even comparable to
    # embedded ones (bench.py stamps cold_mode; VERDICT r12 item 5).
    # Only warm headline artifacts feed the floors.
    if parsed and (
        parsed.get("mode") == "cold"
        or parsed.get("metric") == "cold_suite_total"
    ):
        return {}, None
    if parsed and parsed.get("sf") == 0.1:
        q = {k: float(v) for k, v in parsed.get("queries", {}).items()}
        return q, parsed.get("loadavg_preflight")
    if parsed:  # wrong SF: not comparable to the sf0.1 floors
        return {}, None
    if known is None:
        return {}, None
    tail = rec.get("tail", "")
    vals = _scrape_tail(tail, known)
    m = re.search(r'"loadavg_preflight":\s*\[([\d.,\s]+)\]', tail)
    load = [float(x) for x in m.group(1).split(",")] if m else None
    return vals, load


def build(committed: dict) -> dict:
    artifacts = _round_artifacts()
    # pass 1: parsed artifacts, unrestricted -- their union with the
    # committed ledger defines the known query-name set
    parsed_readings = {tag: _readings(path, None) for tag, path in artifacts}
    known = set(committed.get("floors", {}))
    for vals, _load in parsed_readings.values():
        known |= set(vals)
    # pass 2: tail-scrape the parsed:null artifacts against known
    rounds: list[tuple[str, dict[str, float], list[float] | None]] = []
    for tag, path in artifacts:
        vals, load = parsed_readings[tag]
        if not vals:
            vals, load = _readings(path, known)
        if vals:
            rounds.append((tag, vals, load))

    floors = dict(committed.get("floors", {}))
    era: dict[str, dict] = {
        # start from the committed ledger: attributed to the pre-v2
        # manual merge unless a round artifact reproduces-or-beats it
        q: {"round": None, "loadavg": None, "note": "pre-v2 ledger (r9 quiet-window merge)"}
        for q in floors
    }
    for tag, vals, load in rounds:
        for q, v in vals.items():
            if q not in floors or v <= floors[q]:
                floors[q] = min(v, floors.get(q, v))
                era[q] = {"round": tag, "loadavg": load}

    recent = rounds[-RECENT_WINDOW:]
    recent_floors: dict[str, float] = {}
    for _tag, vals, _load in recent:
        for q, v in vals.items():
            recent_floors[q] = min(recent_floors.get(q, v), v)

    return {
        "sf": 0.1,
        "unit": "sec",
        "source": (
            "floors: all-time per-query min (ledger; committed values "
            "min-merged with every BENCH_r*.json round artifact, incl. "
            "tail-scraped r09). recent_floors: min over the last "
            f"{RECENT_WINDOW} round artifacts -- the wobble-trigger era "
            "(VERDICT r10 item 6). Regenerate: python tools/floors.py --write"
        ),
        "floors": {q: floors[q] for q in sorted(floors)},
        "floor_era": {q: era[q] for q in sorted(era)},
        "recent_rounds": [
            {"round": t, "loadavg_preflight": l} for t, _v, l in recent
        ],
        "recent_floors": {q: recent_floors[q] for q in sorted(recent_floors)},
    }


def main() -> None:
    path = os.path.join(_REPO, "BENCH_FLOORS.json")
    with open(path, encoding="utf-8") as fh:
        committed = json.load(fh)
    out = build(committed)
    text = json.dumps(out, indent=2)
    if "--write" in sys.argv:
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(text + "\n")
        print(f"wrote {path}", file=sys.stderr)
    else:
        print(text)


if __name__ == "__main__":
    main()
