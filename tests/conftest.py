from __future__ import annotations

import copy
import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

ORACLE = REPO / "tools" / "ref_oracle.js"


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()


def run_reference(cases: list[dict]) -> list[dict]:
    """Run the reference validator (node) over a batch of cases.

    Each case: {"data":…, "type":…, "schema":…, "mode":"validate"|"check"}.
    Returns [{"valid":…, "error":…, "data":…}, …] — ``data`` is the
    reference's (possibly normalized/mutated) document.
    """
    payload = "\n".join(json.dumps(c) for c in cases)
    out = subprocess.run(
        ["node", str(ORACLE)], input=payload, capture_output=True,
        text=True, check=True,
    ).stdout
    return [json.loads(line) for line in out.splitlines() if line.strip()]


def run_ours(case: dict) -> dict:
    """Run sjot_ray.core over one case, same result shape as the oracle."""
    from sjot_ray.core import SJOTSchemaError, SJOTValidationError, check, validate

    data = copy.deepcopy(case.get("data"))
    try:
        if case.get("mode") == "check":
            check(copy.deepcopy(case["schema"]))
            return {"valid": True, "error": None, "data": None}
        validate(data, case.get("type"), copy.deepcopy(case.get("schema")))
        return {"valid": True, "error": None, "data": data}
    except (SJOTValidationError, SJOTSchemaError) as e:
        return {"valid": False, "error": str(e), "data": data}


def js_value_eq(a, b) -> bool:
    """Structural equality under the JS number model (1 == 1.0, bool is
    not a number)."""
    import math

    if isinstance(a, float) and math.isnan(a) and b is None:
        return True  # JSON.stringify(NaN) === "null" on the oracle side
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a == b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return float(a) == float(b)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(js_value_eq(x, y) for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        return (list(a.keys()) == list(b.keys())
                and all(js_value_eq(a[k], b[k]) for k in a))
    return type(a) is type(b) and a == b
