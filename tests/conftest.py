from __future__ import annotations

import os
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Route TEST scratch (pytest tmp_path, the queries' tempfile.mkdtemp
# sandboxes, Spark shuffle/local dirs) to the tmpfs when one exists: the
# suite is dominated by control-plane I/O — state-store commits, ledger
# fsyncs, thousands of tiny parquet files — and on this box's ext4 that
# was ~37 min of SYS time for a 26-min wall run (measured r17; tmpfs
# writes are 4x faster and fsync-free). Tests only: bench.py and the
# driver's query runs are untouched, so timed numbers stay comparable.
# An externally-set TMPDIR always wins.
_SHM = "/dev/shm"
if os.path.isdir(_SHM) and os.access(_SHM, os.W_OK) and "TMPDIR" not in os.environ:
    _scratch = os.path.join(_SHM, "reflex_spark_tests")
    os.makedirs(_scratch, exist_ok=True)
    os.environ["TMPDIR"] = _scratch
    tempfile.tempdir = None  # drop the cached pre-TMPDIR choice

from reflex_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="reflex_spark_tests",
        shuffle_partitions=8,
        extra_conf={"spark.local.dir": tempfile.gettempdir()},
    )
    yield s
