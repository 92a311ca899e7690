"""Perf claims have one source of truth (VERDICT r4 #6): RESULTS.md's
headline table must equal a regeneration from the bench artifacts in
benchmarks/headline/ — stale numbers fail here instead of overstating
throughput (the round-2 table survived two rounds of slower headlines).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_results_headline_table_matches_bench_artifacts():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "results_table.py"),
         "--check"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stdout + r.stderr
