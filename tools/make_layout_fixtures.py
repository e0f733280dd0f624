"""Generate layout-perturbed copies of a fixture dir for invariance sweeps.

The driver's fixtures are ONE parquet file per table in generation
order.  Real 100 TB tables are thousands of splits in no particular
order, so two whole bug classes never fire at the gate: hidden
dependence on source row order (collect order, non-total sorts,
positional sampling) and on single-split layout (file-name globs,
per-partition file-count contracts, task-count assumptions).  r14's
first sweeps found one of each — the events stream source globbed leaf
file names (directory tables streamed ZERO rows) and three pruning
contracts were file-count ratios that broke on a 4-file input.

    python tools/make_layout_fixtures.py [src_sf_dir] [dst_root]

writes two variants (deterministic seeds, schemas preserved exactly —
pyarrow take() keeps the physical types the readers special-case):

  <dst_root>/shuf/   — single file per table, rows SHUFFLED
  <dst_root>/multi/  — rows shuffled AND split into up to 4 files,
                       table as a DIRECTORY named <t>.parquet

Sweep with the driver sim (it detects directory tables):

    SF=<dst_root>/shuf  python tools/driver_sim.py
    SF=<dst_root>/multi python tools/driver_sim.py

Both sweeps are ALL MATCH as of r14 (296/296).
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# single source of truth — a new fixture table added to the package
# must flow into the layout sweeps automatically (review-pass r14)
from dbx_workspace_and_emr_iceberg_spark.tables import TABLES  # noqa: E402


def write_sliced(tbl, dst_dir: str, k: int) -> None:
    """Write ``tbl`` as ``dst_dir/part-%02d.parquet`` in ``k``
    contiguous row slices (ceil-spread bounds, schema preserved).  ONE
    implementation shared by the layout sweep and bench.py's
    bench_layout (review-pass r18: the two inline copies of the
    bounds/slice/write loop could drift)."""
    import os as _os

    import pyarrow.parquet as pq

    _os.makedirs(dst_dir)
    n = len(tbl)
    bounds = [round(i * n / k) for i in range(k + 1)]
    for i in range(k):
        pq.write_table(
            tbl.slice(bounds[i], bounds[i + 1] - bounds[i]),
            _os.path.join(dst_dir, f"part-{i:02d}.parquet"),
        )


def make(src: str, dst_root: str) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(20260815)
    shuf_dir = os.path.join(dst_root, "shuf")
    multi_dir = os.path.join(dst_root, "multi")
    for d in (shuf_dir, multi_dir):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)
    for t in TABLES:
        tbl = pq.read_table(f"{src}/{t}.parquet")
        n = len(tbl)
        shuf = tbl.take(pa.array(rng.permutation(n)))
        if not shuf.schema.equals(tbl.schema):
            # explicit raise, not bare assert: python -O strips asserts
            # and a silently drifted physical schema would be swept as
            # if it were the bench's (review-pass r18, the house rule)
            raise AssertionError(f"take() changed {t}'s schema")
        pq.write_table(shuf, f"{shuf_dir}/{t}.parquet")
        k = min(4, max(1, n // 2))
        write_sliced(shuf, f"{multi_dir}/{t}.parquet", k)
        print(f"{t}: {n} rows -> shuf + {k}-file multi")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_layout"
    make(src, dst)
