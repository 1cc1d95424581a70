#!/usr/bin/env python3
"""Executable reader contract for BENCH_SUMMARY.json (r12 ADVICE, carried
through r13 verdict #4-minor: the contract lived only in the writer's own
note field and nothing in-repo enforced it).

Bench writes the summary ONCE, at end of run, via temp-file + atomic
rename; a crashed run leaves the PRIOR summary intact but visibly old.
The contract: a reader must check `written_at_epoch_ms` against its own
run-start time before trusting the file. This module is that check as
code — the driver (or any script) can call

    python3 tools/read_summary.py <summary.json> <run_start_epoch_ms>

which prints the summary JSON on stdout and exits 0 only when the stamp
is fresh; a stale stamp exits 2 with a diagnostic on stderr, and a
missing/invalid file exits 1. Importable: `read_summary(path, start_ms)`
raises StaleSummaryError / ValueError instead of exiting.
"""
import json
import sys


class StaleSummaryError(Exception):
    """The summary predates the caller's run start: a crashed run left
    the previous round's file behind. Never fold these numbers."""


def read_summary(path, run_start_epoch_ms):
    with open(path) as f:
        summary = json.load(f)
    stamp = summary.get("written_at_epoch_ms")
    if not isinstance(stamp, (int, float)):
        raise ValueError(
            f"{path}: no numeric written_at_epoch_ms field - not a "
            "Bench-written summary (or a pre-r11 artifact)")
    if stamp < run_start_epoch_ms:
        raise StaleSummaryError(
            f"{path}: written_at_epoch_ms={int(stamp)} predates the run "
            f"start {int(run_start_epoch_ms)} - the bench run that should "
            "have produced this file crashed and left the prior summary "
            "behind; do not trust these numbers")
    return summary


def main(argv):
    if len(argv) != 3:
        print("usage: read_summary.py <summary.json> <run_start_epoch_ms>",
              file=sys.stderr)
        return 1
    try:
        summary = read_summary(argv[1], float(argv[2]))
    except StaleSummaryError as e:
        print(f"STALE: {e}", file=sys.stderr)
        return 2
    except (OSError, ValueError, json.JSONDecodeError) as e:
        print(f"INVALID: {e}", file=sys.stderr)
        return 1
    json.dump(summary, sys.stdout)
    print()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
