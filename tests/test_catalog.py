"""OPERATORS.md must stay in sync with the queries() registry —
regenerating the catalog (tools/gen_catalog.py) must reproduce the
committed file, so adding/renaming a query without refreshing the
user-facing catalog fails here instead of drifting silently."""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_operators_md_in_sync():
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "gen_catalog.py")],
        capture_output=True, text=True, check=True)
    with open(os.path.join(ROOT, "OPERATORS.md")) as fh:
        committed = fh.read()
    assert out.stdout == committed, (
        "OPERATORS.md is stale — regenerate with "
        "`python tools/gen_catalog.py > OPERATORS.md`")
