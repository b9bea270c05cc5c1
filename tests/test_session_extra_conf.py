"""Pin the SPARK_GRAFT_EXTRA_CONF invariance-sweep hook.

Round-9 find: PYSPARK_SUBMIT_ARGS --conf CANNOT override a conf the
session builder pins with .config() — the Arrow-off correctness axis
had silently been running with Arrow ON.  get_session therefore honors
SPARK_GRAFT_EXTRA_CONF="k=v;k=v" as the LAST word over every default.
A fresh subprocess is required because getOrCreate in this test
process would return the suite's existing session and ignore new
builder confs — which is exactly the trap being pinned.
"""

from __future__ import annotations

import os
import subprocess
import sys

_PROBE = """
import sys
sys.path.insert(0, {repo!r})
from scats_transis_kinesis_spark.session import get_session
spark = get_session(
    shuffle_partitions=2,
    extra_conf={{"spark.ui.showConsoleProgress": "false"}},
)
print("ARROW=" + spark.conf.get("spark.sql.execution.arrow.pyspark.enabled"))
print("AQE=" + spark.conf.get("spark.sql.adaptive.enabled"))
spark.stop()
"""


def test_extra_conf_env_overrides_pinned_defaults():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["SPARK_GRAFT_EXTRA_CONF"] = (
        "spark.sql.execution.arrow.pyspark.enabled=false;"
        "spark.sql.adaptive.enabled=false"
    )
    env["SPARK_GRAFT_CPUS"] = "2"
    out = subprocess.run(
        [sys.executable, "-c", _PROBE.format(repo=repo)],
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    # Both session-pinned defaults (arrow=true, adaptive=true) must be
    # overridden by the env hook.
    assert "ARROW=false" in out.stdout
    assert "AQE=false" in out.stdout


def test_malformed_extra_conf_pair_fails_loud(monkeypatch):
    """Round-10 ADVICE: a pair without '=' (e.g. a typo'd
    'spark.sql.adaptive.enabled', missing '=false') must raise instead
    of silently setting the conf to empty string — otherwise the
    invariance axis the hook drives no-ops, the exact failure class
    the hook was added to fix.  Raises during env parsing, before
    getOrCreate, so this is safe in-process."""
    import pytest

    from scats_transis_kinesis_spark.session import get_session

    monkeypatch.setenv(
        "SPARK_GRAFT_EXTRA_CONF", "spark.sql.adaptive.enabled"
    )
    with pytest.raises(ValueError, match="malformed SPARK_GRAFT_EXTRA_CONF"):
        get_session()
