"""QUERIES.json must stay byte-in-sync with __spark_entry__.queries()."""
import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def test_manifest_in_sync():
    from tools.make_queries_manifest import build_manifest

    on_disk = json.loads((REPO / "QUERIES.json").read_text())
    assert on_disk == build_manifest(), (
        "QUERIES.json is stale — run python tools/make_queries_manifest.py")


def test_every_query_listed_with_oracle_flag():
    import __spark_entry__ as e

    on_disk = json.loads((REPO / "QUERIES.json").read_text())
    listed = {r["name"]: r["oracle"] for r in on_disk["queries"]}
    assert set(listed) == set(e.queries())
    oracles = set(e.oracle_sql())
    for name, has_oracle in listed.items():
        assert has_oracle == (name in oracles)
