from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from dynamic_spark_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark("dss-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


# --- temp-dir hygiene -------------------------------------------------------
# Tests that stage parquet/py files under /tmp previously leaked one small
# dir per run (r7 sweep: ~50 dirs after a day of suite runs — same hygiene
# class as the r6 probe-staging finding). Route all test mkdtemps through
# here; the session-scoped autouse fixture removes them at exit, which is
# late enough for lazily-read streaming sources.
_DSS_TMPDIRS: list[str] = []


def dss_mkdtemp(prefix: str) -> str:
    import tempfile

    d = tempfile.mkdtemp(prefix=prefix)
    _DSS_TMPDIRS.append(d)
    return d


@pytest.fixture(scope="session", autouse=True)
def _dss_tmpdir_cleanup():
    yield
    import shutil

    for d in _DSS_TMPDIRS:
        shutil.rmtree(d, ignore_errors=True)
