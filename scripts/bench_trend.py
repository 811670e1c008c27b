"""Bench trend guard: fail when any query regresses >2x vs the last
recorded round.

The r3→r4 post-mortem motivator: simhash_near_pairs drifted 3.4 → 5.2
→ 10.7 s across two rounds and nothing compared rounds, so the drift
shipped twice before a human noticed. This script diffs the freshest
bench result (BENCH_FULL.json, written by every `python bench.py` run)
against the newest committed driver artifact (BENCH_r*.json) and exits
non-zero on:

* any per-query time > REG_FACTOR x its baseline AND above ABS_FLOOR
  seconds (sub-second queries jitter 2x on a warm/cold JVM — absolute
  floor keeps noise out);
* total wall > REG_FACTOR x baseline total;
* any query that errored in the current run.

Scale factors must match to compare (a sf0.001 smoke vs the sf0.1
round artifact says nothing); mismatches are reported and skipped, not
failed. Run it after a full `python bench.py` at the round's SF:

    python bench.py && python scripts/bench_trend.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

REG_FACTOR = 2.0
ABS_FLOOR = 0.75  # seconds; below this, 2x is JVM/GC jitter, not drift

# Reviewed intentional slowdowns: query -> (shipped_round, why), same
# self-expiry contract as queries._FORCE_REGRADE. An entry is LIVE only
# while the newest BENCH_r*.json baseline predates shipped_round; as
# soon as a round >= shipped_round records the new level, the entry is
# ignored — the guard is strict again and a fresh regression vs the new
# baseline fails. (The r5 entry for ewma_user_value expired the moment
# BENCH_r05.json recorded 2.60 s; kept here as the format example.)
# An UNREVIEWED regression still fails.
INTENTIONAL: dict[str, tuple[int, str]] = {
    "ewma_user_value": (
        5,
        "r5: full-history collect_list fold replaced by bounded-state "
        "affine-segment composition — ~3 small shuffles instead of one "
        "monolithic group-fold; the scale-killer removal is worth the "
        "local-mode second",
    ),
    "mad_outliers_approx": (
        12,
        "r12: 2-column quantized projection persisted so the corpus is "
        "read ONCE instead of 3x — a measured +0.24 s at sf0.1 noop-sink "
        "(scripts/ab_mad_approx.py A/B in the docstring) accepted because "
        "scan count, not local-mode wall, is the binding variable at "
        "100 TB; expired the moment BENCH_r12.json recorded the new level",
    ),
}

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(path: str) -> dict:
    with open(path) as fh:
        data = json.load(fh)
    # Driver round artifacts wrap the bench line under "parsed" (None
    # when that round's bench crashed — r3's NameError round).
    if "parsed" in data:
        return data["parsed"] or {}
    return data


def _round_number(path: str) -> int:
    import re

    m = re.search(r"BENCH_r(\d+)\.json$", os.path.basename(path))
    return int(m.group(1)) if m else 0


def main(cur_path: str | None = None, max_round: int | None = None) -> int:
    # cur_path is an explicit parameter (bench.py passes BENCH_FULL.json)
    # — only the __main__ block consults sys.argv, so an in-process call
    # can never misread the parent's CLI args as an artifact path.
    if cur_path is None:
        cur_path = os.path.join(ROOT, "BENCH_FULL.json")
    try:
        cur = _load(cur_path)
    except (OSError, ValueError) as exc:
        print(f"bench_trend: cannot load artifacts: {exc}")
        return 1
    rounds = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))

    def _usable(path: str) -> dict | None:
        """Return the parsed baseline dict, or None if unusable.

        Returning the dict (not a bool) lets the caller reuse it — each
        usable baseline was previously loaded twice, and a corrupt
        BENCH_r*.json raised out of main() instead of being skipped
        (r15 advisor note).
        """
        if max_round is not None and _round_number(path) > max_round:
            return None
        try:
            data = _load(path)
        except (OSError, ValueError):
            return None  # corrupt round artifact — skip, don't crash
        base_q = data.get("queries")
        if not base_q:
            return None
        # The driver records its own bench run as BOTH BENCH_FULL.json
        # and BENCH_r{N}.json, so right after a driver drop the newest
        # round artifact IS the current run — comparing it to itself is
        # vacuously green (r14 verdict: "210 queries vs BENCH_r14 ...
        # 162.672 -> 162.672 s"). The round artifact stores a TRUNCATED
        # slowest-N subset (marked `queries_truncated`) while
        # BENCH_FULL stores every query, so dict equality alone misses
        # the production shape (r15 verdict defect #1): same-run means
        # equal totals AND the baseline's queries are a subset of the
        # current run's with identical per-query times.
        cur_q = cur.get("queries") or {}
        if data.get("value") == cur.get("value") and all(
            cur_q.get(k) == v for k, v in base_q.items()
        ):
            return None
        return data

    base_path, base = None, None
    for p in reversed(rounds):
        base = _usable(p)
        if base is not None:
            base_path = p
            break
    if base_path is None:
        print("bench_trend: no parseable BENCH_r*.json baseline — nothing to compare")
        return 0
    base_round = _round_number(base_path)

    cur_q = cur.get("queries") or {}
    base_q = base.get("queries") or {}
    errs = {k: v for k, v in (cur.get("errors") or {}).items()}
    if errs:
        print(f"bench_trend: FAIL — {len(errs)} queries errored: {sorted(errs)[:5]}")
        return 1
    if cur.get("sf") != base.get("sf"):
        print(
            f"bench_trend: sf mismatch (current {cur.get('sf')} vs baseline "
            f"{base.get('sf')} in {os.path.basename(base_path)}) — skipping compare"
        )
        return 0

    regressions = []
    for name, t in sorted(cur_q.items()):
        b = base_q.get(name)
        if b is None or not isinstance(b, (int, float)) or b <= 0:
            continue  # new query this round — no baseline yet
        if t > REG_FACTOR * b and t > ABS_FLOOR:
            shipped, why = INTENTIONAL.get(name, (None, ""))
            if shipped is not None and base_round < shipped:
                # Live only until a round >= shipped_round records the
                # new baseline; after that the guard is strict again.
                print(f"  intentional {name}: {b:.2f}s -> {t:.2f}s ({why[:60]}...)")
                continue
            regressions.append((name, b, t))
    tot_b, tot_c = base.get("value"), cur.get("value")
    total_reg = (
        isinstance(tot_b, (int, float))
        and isinstance(tot_c, (int, float))
        and tot_c > REG_FACTOR * tot_b
    )

    print(
        f"bench_trend: {len(cur_q)} queries vs {os.path.basename(base_path)} "
        f"({len(base_q)} baseline): total {tot_b} -> {tot_c} s"
    )
    for name, b, t in regressions:
        print(f"  REGRESSION {name}: {b:.2f}s -> {t:.2f}s ({t / b:.1f}x)")
    if total_reg:
        print(f"  REGRESSION total: {tot_b:.2f}s -> {tot_c:.2f}s")
    if regressions or total_reg:
        return 1
    print("bench_trend: no query regressed >2x")
    return 0


if __name__ == "__main__":
    # usage: bench_trend.py [CUR_ARTIFACT] [--max-round N]
    # --max-round caps the baseline round explicitly (e.g. the judge
    # diffing round 15 against 14 even when BENCH_FULL has drifted).
    argv = sys.argv[1:]
    mr = None
    if "--max-round" in argv:
        i = argv.index("--max-round")
        mr = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    sys.exit(main(argv[0] if argv else None, max_round=mr))
