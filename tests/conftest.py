from __future__ import annotations

import os

import pytest

from datalake_brief_spark import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"

if os.environ.get("TXLOG_LOGSTORE") == "s3":
    # Route EVERY txlog commit-protocol byte through the shipped
    # conditional-write object-store LogStore (filesystem-backed client,
    # conditional creates enforced by the store's own precondition logic
    # instead of O_EXCL): `TXLOG_LOGSTORE=s3 pytest tests/test_txlog.py`
    # re-runs the whole lakehouse suite under object-store semantics.
    from datalake_brief_spark.sources import logstore

    logstore.set_log_store(
        "", logstore.S3ConditionalLogStore(logstore.FilesystemObjectClient())
    )


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
