from __future__ import annotations

import json
import subprocess
import sys

from graphiti_spark.operators.lookups import (
    get_by_group_ids,
    get_by_uuid,
    get_by_uuids,
    get_edges_by_node_uuid,
)


def _nodes(spark):
    rows = [(f"u{i}", f"name{i}", "g1" if i < 3 else "g2") for i in range(6)]
    return spark.createDataFrame(rows, "uuid string, name string, group_id string")


def test_point_and_list_lookups(spark):
    n = _nodes(spark)
    assert get_by_uuid(n, "u2").collect()[0]["name"] == "name2"
    assert {r["uuid"] for r in get_by_uuids(n, ["u1", "u4"]).collect()} == {"u1", "u4"}


def test_cursor_pagination(spark):
    n = _nodes(spark)
    page1 = [r["uuid"] for r in get_by_group_ids(n, ["g1"], limit=2).collect()]
    assert page1 == ["u2", "u1"]
    page2 = [r["uuid"] for r in get_by_group_ids(n, ["g1"], limit=2, uuid_cursor=page1[-1]).collect()]
    assert page2 == ["u0"]


def test_edges_by_node(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")],
        "source_node_uuid string, target_node_uuid string",
    )
    assert get_edges_by_node_uuid(e, "b").count() == 2


def test_cli_end_to_end(tmp_path):
    out_dir = str(tmp_path / "cliout")
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "graphiti_spark.cli",
            "--input-documents",
            "/root/testdata/sf0.001",
            "--output",
            out_dir,
            "--master",
            "local[4]",
        ],
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = proc.stdout.strip().splitlines()[-1]
    payload = json.loads(line)
    assert payload["counts"]["episodes"] == 500
    assert payload["counts"]["edges"] > 0
    assert "s6_uuid_map" in payload["stages_run"]
