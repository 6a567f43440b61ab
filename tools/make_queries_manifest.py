"""Regenerate QUERIES.json — the explicit query manifest for the driver.

The driver's CORRECTNESS harness replayed a stale 50-key list in round 2
while ``__spark_entry__.queries()`` had grown to 70; this manifest makes the
full registry discoverable without importing Spark.  Run:

    python tools/make_queries_manifest.py

``tests/test_queries_manifest.py`` keeps the file in sync.
"""
from __future__ import annotations

import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def build_manifest() -> dict:
    import __spark_entry__ as e

    names = list(e.queries())
    oracles = e.oracle_sql()
    # which entries have REAL driver-side evidence on record (any
    # round): a hash match, or a rows-only match for oracle-less
    # queries.  Key-presence alone is NOT evidence — an err row like
    # r05's doc_classifier_fit (err: no_oracle, every match field
    # null) is a failed no-op and must stay in driver_unchecked.
    checked: set[str] = set()
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        for name, rec in json.loads(f.read_text()).items():
            if rec.get("hash_match") is True or (
                    rec.get("hash_match") is None
                    and rec.get("rows_match") is True
                    and not rec.get("err")):
                # hash_match=false + rows_match=true is a FAILED hash
                # check (a real discrepancy), not evidence; rows-only
                # counts only for oracle-less queries (hash_match null)
                checked.add(name)
    unchecked = [n for n in names if n not in checked]
    return {
        "count": len(names),
        "driver_unchecked_count": len(unchecked),
        "driver_unchecked": unchecked,
        "queries": [
            {"name": n, "oracle": n in oracles,
             "driver_checked": n in checked} for n in names
        ],
    }


def main() -> None:
    manifest = build_manifest()
    out = REPO / "QUERIES.json"
    out.write_text(json.dumps(manifest, indent=2) + "\n")
    n_oracle = sum(1 for r in manifest["queries"] if r["oracle"])
    print(f"wrote {out}: {manifest['count']} queries, {n_oracle} with oracles")


if __name__ == "__main__":
    main()
