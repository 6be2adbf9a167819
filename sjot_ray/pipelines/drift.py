"""Distribution-drift query wrappers (KLL + t-digest quantile sketches,
wide_checks.drift_check)."""

from __future__ import annotations

import pyarrow as pa

import ray
import ray.data


def q_drift_lineitem_price(sf_dir: str):
    """Drift of l_extendedprice between the full table (baseline) and a
    synthetic +20% shifted copy (the FIXTURES.md F4 target): the check must
    flag the shifted copy and clear the identity comparison."""
    from .wide_checks import drift_check

    base = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                                 columns=["l_extendedprice"])

    def shift(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({"l_extendedprice":
                         pc.multiply(t["l_extendedprice"], 1.2)})

    shifted = base.map_batches(shift, batch_format="pyarrow",
                               zero_copy_batch=True)
    same = drift_check(base, base, "l_extendedprice")
    moved = drift_check(shifted, base, "l_extendedprice")
    moved_td = drift_check(shifted, base, "l_extendedprice",
                           sketch="tdigest")
    return pa.table({
        "comparison": pa.array(["identity", "shifted+20%",
                                "shifted+20% (tdigest)"]),
        "max_shift_iqr": pa.array([round(same["max_shift_iqr"], 4),
                                   round(moved["max_shift_iqr"], 4),
                                   round(moved_td["max_shift_iqr"], 4)]),
        "drifted": pa.array([same["drifted"], moved["drifted"],
                             moved_td["drifted"]]),
    })
