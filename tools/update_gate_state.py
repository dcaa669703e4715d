"""Stamp tools/gate_state.json after a round: the first 50 queries() entries
(the ones the driver's correctness gate will verify) get last_gated = ROUND.

Usage:
  python tools/update_gate_state.py --round N            # stamp gated slots
  python tools/update_gate_state.py --touch q1 q2 ...    # force to the front
                                                         # (operator changed)

TIMING MATTERS: the driver verifies the first 50 of the ordering as
COMMITTED at round end, so run `--round N` at the START of round N+1 (it
records what round N's driver just gated), BEFORE any --touch edits for the
new round. Stamping mid-round would reorder queries() out from under the
stamp and record a set the driver never ran.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STATE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "gate_state.json")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=None)
    ap.add_argument("--touch", nargs="*", default=[])
    args = ap.parse_args()

    try:
        with open(STATE) as f:
            state = json.load(f)
    except FileNotFoundError:
        state = {"last_gated": {}}
    last = state.setdefault("last_gated", {})

    import __spark_entry__ as entrymod

    names = list(entrymod.queries())
    for n in args.touch:
        if n not in names:
            raise SystemExit(f"unknown query: {n}")
        last[n] = -1
    if args.round is not None:
        gated = names[: entrymod._GATE_SLOTS]
        for n in gated:
            last[n] = args.round
        print(f"stamped {len(gated)} gated queries with round {args.round}")
        print("rotated out this round:", ", ".join(names[entrymod._GATE_SLOTS:]) or "(none)")
    with open(STATE, "w") as f:
        json.dump(state, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
