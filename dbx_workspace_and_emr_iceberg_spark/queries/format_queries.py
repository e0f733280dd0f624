"""S2/S3 format round-trip queries: CSV, JSON, ORC written and re-read
by this engine must reproduce the Parquet-sourced oracle exactly —
proving the text-format schema-on-read path (timestamps included)
doesn't corrupt values.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.formats import roundtrip
from ..tables import load_table

# Round-trip files live under one process-lifetime root (NOT deleted in
# the query body): the returned DataFrame stays a lazy scan over the
# written files — no .collect() re-materialization on the driver — and
# mode("overwrite") keeps repeat runs idempotent.
_TMP_ROOT = tempfile.mkdtemp(prefix="spark_graft_fmt_")
# lazy returned DataFrames read these files until process exit
import atexit as _atexit  # noqa: E402
import shutil as _shutil  # noqa: E402

_atexit.register(_shutil.rmtree, _TMP_ROOT, ignore_errors=True)

_NATION_ORACLE = """
SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey
"""


def _roundtrip_query(fmt: str, options: dict[str, str] | None = None):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        n = load_table(spark, sf_dir, "nation")
        back = roundtrip(
            n, os.path.join(_TMP_ROOT, f"nation_{fmt}"), fmt, options
        )
        return back.select("n_nationkey", "n_name", "n_regionkey").orderBy(
            "n_nationkey"
        )

    return q


register("s2_csv_roundtrip", oracle=_NATION_ORACLE, tags=("S2",))(
    _roundtrip_query("csv", {"header": "true"})
)
register("s2b_json_roundtrip", oracle=_NATION_ORACLE, tags=("S2",))(
    _roundtrip_query("json")
)
register("s2c_orc_roundtrip", oracle=_NATION_ORACLE, tags=("S2",))(
    _roundtrip_query("orc")
)


_EVENTS_TS_ORACLE = """
SELECT event_id, ts, round(value, 6) AS value
FROM events
WHERE event_id % 101 = 0
ORDER BY event_id
"""


@register("s2d_json_timestamp_roundtrip", oracle=_EVENTS_TS_ORACLE, tags=("S2", "F2"))
def s2d_json_timestamp_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamps through the JSON text format (ISO-8601 serialization)
    must survive to the microsecond."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") % 101 == 0)
        .select("event_id", "ts", "value")
    )
    # default JSON timestamp formats truncate to millis; request µs.
    # ts is TIMESTAMP_NTZ (tables.py canonical form), which JSON
    # serializes via timestampNTZFormat — timestampFormat alone only
    # covers zoned TIMESTAMP columns and would silently drop micros.
    back = roundtrip(
        ev,
        os.path.join(_TMP_ROOT, "events_json_ts"),
        "json",
        {
            "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
            "timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
        },
    )
    return back.select(
        "event_id", "ts", F.round("value", 6).alias("value")
    ).orderBy("event_id")
