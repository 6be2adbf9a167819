"""Run the reference repo's own end-to-end fixture (dev/test.js:3-112)
through both engines: SJOT.check on the mega-schema and SJOT.validate of the
mega-document, plus mutated invalid variants of every top-level field."""

from __future__ import annotations

import copy
import json
import subprocess

import pytest

from .conftest import REPO, js_value_eq, run_ours, run_reference

_EXTRACT = r"""
const fs = require("fs");
let src = fs.readFileSync("/root/reference/dev/test.js", "utf8");
src = src.replace(/var SJOT = require\([^)]*\);/,
                  "var SJOT = {check: () => true, validate: () => true};");
src = src.replace(/console\.log[^;]*;/, "");
eval(src);
process.stdout.write(JSON.stringify({schema: schema, data: data}));
"""


@pytest.fixture(scope="module")
def fixture():
    out = subprocess.run(["node", "-e", _EXTRACT], capture_output=True,
                         text=True, check=True).stdout
    return json.loads(out)


def test_mega_schema_checks(fixture):
    from sjot_ray.core import check

    assert check(copy.deepcopy(fixture["schema"])) is True


def test_mega_document_validates(fixture):
    case = {"data": fixture["data"], "type": "@root",
            "schema": fixture["schema"], "mode": "validate"}
    ref = run_reference([case])[0]
    ours = run_ours(case)
    assert ref["valid"] is True
    assert ours["valid"] is True
    assert js_value_eq(ours["data"], ref["data"])


# per-field mutations that must flip specific verdicts
_MUTATIONS = [
    ("byte", 128), ("short", 40000), ("int", 2**31), ("long", 2**47),
    ("ubyte", -1), ("ushort", -1), ("uint", -1), ("ulong", -1),
    ("integer", 1.5), ("boolean", 0), ("atom", [1]),
    ("n,m", 2), ("n..m", 11), ("<n..m>", -10),
    ("string", 1), ("base64", "!!"), ("hex", "xyz"), ("uuid", "nope"),
    ("date", "2026/01/01"), ("time", "25:00"), ("datetime", "2026-01-01"),
    ("duration", "1S"), ("char", "cc"), ("char10", "abcdefghijklmnop"),
    ("regex", "regexx"), ("strings", [1]), ("stringss", ["a"]),
    ("strings10", []), ("stringset", ["a", "a"]), ("stringset10", []),
    ("n..m{}", [11]), ("#ref", 1), ("null", 0),
    ("obj", {"[a]": 0, "a": "s"}), ("arr", ["x"]), ("arr1", []),
    ("arr1to10", list(range(11))), ("arr0", [1]),
    ("tuple", ["s"]), ("union", True),
]


@pytest.mark.parametrize("field,bad", _MUTATIONS)
def test_mega_document_mutations(fixture, field, bad):
    doc = copy.deepcopy(fixture["data"])
    doc[field] = bad
    case = {"data": doc, "type": "@root", "schema": fixture["schema"],
            "mode": "validate"}
    ref = run_reference([case])[0]
    ours = run_ours(case)
    assert ref["valid"] is False, f"mutation {field}={bad!r} unexpectedly valid in reference"
    assert ours["valid"] is False
    assert ours["error"] == ref["error"]
