"""Honest-evidence window rotation for the driver registry.

The driver checks only the FIRST 50 entries of `__spark_entry__.queries()`
each round (CORRECTNESS_r{N}.json). Keeping every row's driver evidence
fresh therefore means ROTATING the window every round: never-driver-checked
rows first, then the rows whose freshest artifact is oldest. This tool
computes that order from the CORRECTNESS artifacts and (with --apply)
rewrites BOTH return dicts in `__spark_entry__.py` by AST splicing — the
round-10 device, made durable.

Policy (the order within the new registry):
1. never-driver-checked rows (no CORRECTNESS artifact mentions them),
   in current registry order;
2. all remaining rows by ascending freshest-evidence round, current
   registry order within a round;
3. the first 50 of that sequence form the window; everything after is the
   tail — which is therefore ALREADY the next round's promotion queue.

Usage:
  python tools/rotate_registry.py                 # dry run: print the plan
  python tools/rotate_registry.py --apply N       # splice, tagging round N
  python tools/rotate_registry.py --promote name ...
                                                  # treat these as
                                                  # never-checked (row
                                                  # semantics changed
                                                  # this round)
  python tools/rotate_registry.py --hold name ... # keep these out of the
                                                  # window (debut-in-tail
                                                  # rows, e.g. a row whose
                                                  # VERDICT item asked for a
                                                  # tail debut + promotion
                                                  # note)

After --apply: run tests/test_plans.py::test_driver_contract_registry and
`tools/check_correctness.py <sf0.01>` (no names = full sweep) before
committing; record displacement rationales in COVERAGE.md.
"""

from __future__ import annotations

import ast
import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENTRY = os.path.join(REPO, "__spark_entry__.py")


def evidence_map() -> dict[str, int]:
    """query -> freshest CORRECTNESS round that checked it."""
    evid: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                rows = json.load(f)
            rnd = int(os.path.basename(path)[len("CORRECTNESS_r"):].split(".")[0])
        except Exception:
            continue
        if not isinstance(rows, dict):
            continue
        for k in rows:
            evid[k] = max(evid.get(k, 0), rnd)
    return evid


def current_entries(src: str, fn_name: str) -> tuple[dict[str, str], ast.Return]:
    tree = ast.parse(src)
    node = next(
        n for n in tree.body if isinstance(n, ast.FunctionDef) and n.name == fn_name
    )
    ret = next(n for n in ast.walk(node) if isinstance(n, ast.Return))
    d = ret.value
    assert isinstance(d, ast.Dict), f"{fn_name} does not return a dict literal"
    vals = {
        k.value: ast.get_source_segment(src, v) for k, v in zip(d.keys, d.values)
    }
    return vals, ret


def plan(
    order: list[str],
    evid: dict[str, int],
    hold: set[str],
    promote: set[str] = frozenset(),
) -> list[str]:
    # --promote: treat these rows as never-checked even though an older
    # CORRECTNESS artifact mentions them — the honest move when a row's
    # SEMANTICS changed this round (its old evidence describes code that
    # no longer exists; e.g. gopher_quality's r11 bullet-threshold +
    # alpha routing change).
    evid = {k: v for k, v in evid.items() if k not in promote}
    never = [q for q in order if q not in evid and q not in hold]
    by_age = sorted(
        (q for q in order if q in evid and q not in hold),
        key=lambda q: (evid[q], order.index(q)),
    )
    held = [q for q in order if q in hold]
    seq = never + by_age
    window, rest = seq[:50], seq[50:]
    # held rows go to the tail front (they are never-checked debuts —
    # next round's first promotions), then the rest oldest-first
    return window + held + rest


def apply(new_order: list[str], round_no: int) -> None:
    with open(ENTRY) as f:
        src = f.read()
    lines = src.splitlines(keepends=True)
    qvals, qret = current_entries(src, "queries")
    ovals, oret = current_entries(src, "oracle_sql")
    assert set(new_order) == set(qvals) == set(ovals)

    win_comment = (
        f"        # ---- correctness window: first 50 = driver-checked."
        f" Round-{round_no}\n"
        f"        # rotation (tools/rotate_registry.py, honest-evidence"
        f" policy):\n"
        f"        # never-driver-checked rows lead, then"
        f" oldest-evidence-first.\n"
        f"        # Displacement rationales: COVERAGE.md. ----\n"
    )
    tail_comment = (
        "        # ---- tail: locally oracle-checked every round"
        " (driver_sim /\n"
        "        # check_correctness); ordered oldest-evidence-first, so"
        " this IS\n"
        f"        # the round-{round_no + 1} promotion queue. ----\n"
    )

    def build(vals, wc, tc):
        out = ["    return {\n", wc]
        for i, k in enumerate(new_order):
            if i == 50:
                out.append(tc)
            out.append(f"        {k!r}: {vals[k]},\n")
        out.append("    }\n")
        return "".join(out)

    spans = sorted(
        [
            (qret.lineno - 1, qret.end_lineno, build(qvals, win_comment, tail_comment)),
            (
                oret.lineno - 1,
                oret.end_lineno,
                build(
                    ovals,
                    "        # (order mirrors queries() exactly — the driver"
                    " zips them)\n",
                    "",
                ),
            ),
        ],
        reverse=True,
    )
    for lo, hi, text in spans:
        lines[lo:hi] = [text]
    with open(ENTRY, "w") as f:
        f.write("".join(lines))


def main() -> None:
    args = sys.argv[1:]
    hold: set[str] = set()
    round_no = None
    promote: set[str] = set()
    if "--promote" in args:
        i = args.index("--promote")
        j = i + 1
        while j < len(args) and not args[j].startswith("--"):
            promote.add(args[j]); j += 1
        args = args[:i] + args[j:]
    if "--hold" in args:
        i = args.index("--hold")
        hold = set(args[i + 1 :])
        args = args[:i]
    if "--apply" in args:
        i = args.index("--apply")
        round_no = int(args[i + 1])

    with open(ENTRY) as f:
        src = f.read()
    qvals, _ = current_entries(src, "queries")
    order = list(qvals)
    evid = evidence_map()
    new_order = plan(order, evid, hold, promote)
    window = new_order[:50]
    print(json.dumps({
        "n": len(new_order),
        "never_checked": [q for q in order if q not in evid],
        "window": window,
        "window_evidence": {q: evid.get(q) for q in window},
        "tail_head": new_order[50:60],
    }, indent=1))
    if round_no is not None:
        apply(new_order, round_no)
        print(f"APPLIED round-{round_no} rotation to {ENTRY}")


if __name__ == "__main__":
    main()
