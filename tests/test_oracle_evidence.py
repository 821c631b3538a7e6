"""VERDICT r3 #4: the committed ORACLE_LOCAL evidence file can never
silently lag the query registry — every registered query (driver-gate 50
AND extras) must have a record in the NEWEST committed ORACLE_LOCAL_r*.json
with zero failures. Adding a query without regenerating the evidence
(scripts/check_oracle.py --json ORACLE_LOCAL_rN.json) fails this test."""

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _newest_oracle_local() -> str:
    files = glob.glob(os.path.join(REPO, "ORACLE_LOCAL_r*.json"))
    assert files, "no committed ORACLE_LOCAL evidence file"
    def round_no(p):
        m = re.search(r"ORACLE_LOCAL_r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1
    return max(files, key=round_no)


def test_committed_oracle_evidence_covers_every_registered_query():
    from harness.queries import EXTRA_QUERIES, QUERIES

    path = _newest_oracle_local()
    with open(path) as f:
        data = json.load(f)
    records = data["queries"]
    registered = set(QUERIES) | set(EXTRA_QUERIES)
    missing = registered - set(records)
    assert not missing, (
        f"{os.path.basename(path)} is stale: registered queries "
        f"{sorted(missing)} have no committed oracle evidence — rerun "
        f"scripts/check_oracle.py --json {os.path.basename(path)}"
    )
    assert data["failed"] == 0, f"{path} records failures"
    bad = {n: r for n, r in records.items() if r["status"] == "fail"}
    assert not bad, bad
