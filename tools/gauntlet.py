"""Round-end gauntlet: the mechanical pre-snapshot gate.

Rounds 6-8 relied on the builder remembering to run the full test
suite, the full-catalog oracle sweep, the bench CLI and the docs
refresh before the snapshot commit; round 8 shipped two broken catalog
entries because that memory failed. This script IS the checklist —
run it, read the table, do not snapshot on any FAIL:

    python tools/gauntlet.py --round 9 [--fast]

Steps (each timed, each with an unambiguous PASS/FAIL):
  1. registration integrity — every catalog entry name-matches its
     function and takes (spark, sf_dir) (import-time guard + AST scan)
  2. full pytest (~14 min; --fast keeps -x and skips nothing else)
  3. full-catalog oracle sweep at sf0.1 (sf0.01 with --fast)
  4. bench.py — must exit 0 and print one JSON line with the driver's
     keys (this alone would have caught the round-8 registration bug)
  5. phase timings — tools/phase_timings.py regenerates
     docs/PHASE_TIMINGS.md (the build/serve split for the index
     entries, so a serving regression can't hide in bootstrap noise)
  6. docs gate — tools/regen_docs.py --round N

Total wall ~25-30 min. Exit code = number of failed steps.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(name: str, cmd: list[str], check) -> tuple[str, bool, float, str]:
    t0 = time.time()
    proc = subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True
    )
    dt = time.time() - t0
    ok, detail = check(proc)
    return name, ok, dt, detail


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument(
        "--fast",
        action="store_true",
        help="sweep at sf0.01 instead of sf0.1 (iteration mode; the "
        "real round-end run must be un-fast)",
    )
    args = ap.parse_args()
    py = sys.executable
    results = []

    def tail(p, n=3):
        return " | ".join((p.stdout + p.stderr).strip().splitlines()[-n:])

    results.append(
        run(
            "integrity",
            [py, "-c",
             "from iheardai_data_pipeline_spark.plans.catalog import "
             "query_map; q = query_map(); print(len(q), 'entries')"],
            lambda p: (p.returncode == 0, tail(p, 1)),
        )
    )
    print(f"[1/6] integrity: {'PASS' if results[-1][1] else 'FAIL'}")

    results.append(
        run(
            "pytest",
            [py, "-m", "pytest", "tests/", "-q", "-x",
             "-p", "no:cacheprovider"],
            lambda p: (p.returncode == 0, tail(p, 2)),
        )
    )
    print(f"[2/6] pytest: {'PASS' if results[-1][1] else 'FAIL'}")

    sf = "/root/testdata/sf0.01" if args.fast else "/root/testdata/sf0.1"

    def sweep_check(p):
        # parse the "N/N green" tally explicitly (ADVICE r9: the old
        # '"0 FAILED" not in tail' clause was dead logic — sweep_oracle
        # prints 'FAILED: <names>', never a '0 FAILED' tally)
        import re

        m = re.search(r"(\d+)/(\d+) green", p.stdout + p.stderr)
        ok = (
            p.returncode == 0
            and m is not None
            and m.group(1) == m.group(2)
            and int(m.group(2)) > 0
        )
        # record the parsed tally, not the raw output tail (which is
        # often a WARN line and useless in the round log)
        detail = m.group(0) if m else tail(p, 2)
        return ok, detail

    results.append(run("sweep", [py, "tools/sweep_oracle.py", sf], sweep_check))
    print(f"[3/6] sweep@{os.path.basename(sf)}: "
          f"{'PASS' if results[-1][1] else 'FAIL'}")

    def bench_check(p):
        if p.returncode != 0:
            return False, tail(p, 3)
        try:
            line = json.loads(p.stdout.strip().splitlines()[-1])
        except (json.JSONDecodeError, IndexError):
            return False, "no JSON line on stdout"
        want = {"metric", "value", "unit", "queries", "sf"}
        miss = want - set(line)
        return (
            not miss,
            f"{line.get('value')}s over {len(line.get('queries', {}))} "
            f"queries" if not miss else f"missing keys {miss}",
        )

    results.append(run("bench", [py, "bench.py"], bench_check))
    print(f"[4/6] bench: {'PASS' if results[-1][1] else 'FAIL'}")

    results.append(
        run(
            "phases",
            [py, "tools/phase_timings.py"]
            + (["--sf-dir", "/root/testdata/sf0.01", "--repeats", "1"]
               if args.fast else []),
            lambda p: (p.returncode == 0, tail(p, 1)),
        )
    )
    print(f"[5/6] phase timings: {'PASS' if results[-1][1] else 'FAIL'}")

    results.append(
        run(
            "docs",
            [py, "tools/regen_docs.py", "--round", str(args.round)],
            lambda p: (p.returncode == 0, tail(p, 3)),
        )
    )
    print(f"[6/6] docs: {'PASS' if results[-1][1] else 'FAIL'}")

    print("\n== gauntlet ==")
    failed = 0
    for name, ok, dt, detail in results:
        status = "PASS" if ok else "FAIL"
        failed += 0 if ok else 1
        print(f"  {status}  {name:<10} {dt:7.1f}s  {detail}")
    print("SNAPSHOT OK" if failed == 0 else f"{failed} step(s) FAILED "
          "— do not snapshot")
    return failed


if __name__ == "__main__":
    raise SystemExit(main())
