"""CLI black-box tests (the reference tests its CLI via subprocess too:
tests/test_open_buildings.py:145-208). The pure-python tool commands run as
subprocesses; Spark-backed commands are covered by the pipeline tests."""

import json
import subprocess
import sys

from tests.fixtures import SEYCHELLES_AOI, SEYCHELLES_QUADKEY, SEYCHELLES_WKT


def _run(args: list[str], stdin: str | None = None) -> str:
    out = subprocess.run(
        [sys.executable, "-m", "open_buildings_spark", *args],
        input=stdin,
        capture_output=True,
        text=True,
        cwd="/root/repo",
        check=True,
    )
    return out.stdout


def test_cli_quadkey_stdin_golden():
    got = _run(["quadkey"], stdin=json.dumps(SEYCHELLES_AOI)).strip()
    assert got == SEYCHELLES_QUADKEY


def test_cli_wkt_golden():
    got = _run(["wkt"], stdin=json.dumps(SEYCHELLES_AOI)).strip()
    assert got == SEYCHELLES_WKT


def test_cli_quad2json_golden():
    got = json.loads(_run(["quad2json", "031313131112"]))
    ring = got["geometry"]["coordinates"][0]
    assert abs(ring[0][0] - -0.17578125) < 1e-12
    assert abs(ring[0][1] - 51.50874245880333) < 1e-12


def test_cli_sql_contains_prefix_and_within():
    got = _run(["sql"], stdin=json.dumps(SEYCHELLES_AOI))
    assert f"quadkey LIKE '{SEYCHELLES_QUADKEY}%'" in got
    assert "st_within" in got


def test_cli_sql_only_quadkey():
    got = _run(["sql", "--only-quadkey"], stdin=json.dumps(SEYCHELLES_AOI))
    assert "st_within" not in got


def test_cli_unknown_command_errors():
    r = subprocess.run(
        [sys.executable, "-m", "open_buildings_spark", "nope"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert r.returncode != 0
    assert "invalid choice" in r.stderr
