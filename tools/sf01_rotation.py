#!/usr/bin/env python
"""Rotating-thirds schedule for the full-surface sf0.1 drive (r11
verdict, Next #2).

The 257-query sf0.1 pass projected ~7 h on the r11 host and was killed;
a sustainable cadence drives roughly a THIRD of the registry per round
(stalest-first, like the driver's correctness sampler), so every
query's sf0.1 provenance stays <= 3 rounds old while each round's drive
stays inside a ~1-2 h budget. SF01_PROVENANCE.json records, per
registry key, the last round whose close-out drove it green at sf0.1.

  --plan [--size N]               print the round's drive list:
        every key whose recorded round is among the stalest, size
        default ceil(registry/3); keys missing from the file (new
        registrations) count as round 0 and sort first. Ties break in
        registry (sampler-priority) order. Pipe straight into
        verify_drive:  python tools/verify_drive.py /root/testdata/sf0.1 \
                          $(python tools/sf01_rotation.py --plan)
  --record R key...               after a GREEN drive: stamp the keys
        with round R (adds new keys). Refuses to stamp unknown names.
  --status                        provenance histogram + max staleness.

The close-out contract: drive (stalest third ∪ the diff's
touched-queries list from tools/touched_queries.py), record the green
list, and quote --status in BENCH_NOTES. Initialized at r12 with every
pre-existing key at round 10 — the last FULL sf0.1 drive (r10
close-out). The 29 r11-targeted keys are deliberately left at 10: the
conservative direction (they re-drive sooner, never later).
"""

from __future__ import annotations

import json
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PROV_PATH = os.path.join(REPO, "SF01_PROVENANCE.json")


def load() -> dict[str, int]:
    if not os.path.isfile(PROV_PATH):
        return {}
    with open(PROV_PATH) as fh:
        return json.load(fh)["rounds"]


def save(rounds: dict[str, int]) -> None:
    with open(PROV_PATH, "w") as fh:
        json.dump({"rounds": dict(sorted(rounds.items()))}, fh, indent=1)


def registry_order() -> list[str]:
    import __spark_entry__ as E
    return list(E.queries())


def main() -> int:
    args = sys.argv[1:]
    if args[:1] == ["--record"]:
        rnd = int(args[1])
        keys = args[2:]
        rounds = load()
        order = registry_order()
        unknown = [k for k in keys if k not in order]
        if unknown:
            raise SystemExit(f"not registry keys: {unknown}")
        for k in keys:
            rounds[k] = max(rnd, rounds.get(k, 0))
        save(rounds)
        print(f"stamped {len(keys)} keys at round {rnd}")
        return 0

    rounds = load()
    order = registry_order()
    staleness = [(rounds.get(k, 0), i, k) for i, k in enumerate(order)]
    if args[:1] == ["--status"]:
        hist: dict[int, int] = {}
        for r, _, _ in staleness:
            hist[r] = hist.get(r, 0) + 1
        print("sf0.1 provenance by round:",
              json.dumps(dict(sorted(hist.items()))))
        oldest = min(r for r, _, _ in staleness)
        print(f"oldest round: {oldest}; keys at it: "
              f"{sum(1 for r, _, _ in staleness if r == oldest)}")
        return 0

    # strict parse (r12 ADVICE low): only --plan [--size N] reaches
    # here; any unrecognized token must FAIL, not silently fall
    # through to plan output (a typoed --record would otherwise print
    # a plan and the caller's shell would drive the wrong list)
    size = math.ceil(len(order) / 3)
    rest = list(args)
    if rest[:1] == ["--plan"]:
        rest = rest[1:]
    if rest[:1] == ["--size"]:
        if len(rest) < 2:
            raise SystemExit("--size requires a value")
        size = int(rest[1])
        rest = rest[2:]
    if rest:
        raise SystemExit(
            f"unrecognized arguments: {rest} — usage: --plan [--size N] "
            "| --record R key... | --status")
    staleness.sort()
    plan = [k for _, _, k in staleness[:size]]
    print(" ".join(plan))
    return 0


if __name__ == "__main__":
    sys.exit(main())
