"""Small shared helpers with no Spark dependency."""

from __future__ import annotations

import atexit
import shutil
import tempfile


def process_tmp_root(prefix: str) -> str:
    """A temp directory that lives until PROCESS EXIT, then is removed.

    For query modules that return lazy DataFrames over files they wrote:
    the driver collects after the query function returns, so a
    try/finally cleanup would yank the files out from under the scan.
    atexit bounds the leak instead (each query run still recreates its
    own subdirectory for idempotence)."""
    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d
