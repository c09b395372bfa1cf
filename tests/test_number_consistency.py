"""Docs-vs-artifacts consistency gate (round-5 verdict item 6).

Rounds 2-4 each shipped a number-drift finding: README / docs/modes.md
quoting a throughput figure matching no committed artifact. This test
runs scripts/check_numbers.py in the fast lane so a stale quote fails
the suite the moment either side changes. No JAX, no chip — pure file
parsing.
"""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_docs_match_artifacts():
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts",
                                      "check_numbers.py")],
        capture_output=True, text=True)
    assert proc.returncode == 0, proc.stdout + proc.stderr
