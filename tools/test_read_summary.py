#!/usr/bin/env python3
"""Unit test for the BENCH_SUMMARY.json reader contract (run directly:
python3 tools/test_read_summary.py). Pins the three verdicts: fresh stamp
accepted, stale stamp rejected (the crashed-run-left-prior-file case),
stampless file rejected as invalid."""
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from read_summary import StaleSummaryError, read_summary  # noqa: E402


def write(d):
    f = tempfile.NamedTemporaryFile(
        "w", suffix=".json", delete=False)
    json.dump(d, f)
    f.close()
    return f.name


def main():
    fresh = write({"metric": "total", "value": 1.0,
                   "written_at_epoch_ms": 2_000_000})
    assert read_summary(fresh, 1_500_000)["value"] == 1.0

    # the failure this contract exists for: a crashed run leaves the
    # PRIOR round's summary, whose stamp predates this run's start
    stale = write({"metric": "total", "value": 99.0,
                   "written_at_epoch_ms": 1_000_000})
    try:
        read_summary(stale, 1_500_000)
        raise AssertionError("stale stamp was accepted")
    except StaleSummaryError:
        pass

    # equality is fresh (stamp taken after run start by construction)
    assert read_summary(fresh, 2_000_000)["value"] == 1.0

    # a stampless file is not a Bench summary at all
    nostamp = write({"metric": "total", "value": 1.0})
    try:
        read_summary(nostamp, 0)
        raise AssertionError("stampless file was accepted")
    except ValueError:
        pass

    for p in (fresh, stale, nostamp):
        os.unlink(p)
    print("read_summary contract: 4/4 ok")


if __name__ == "__main__":
    main()
