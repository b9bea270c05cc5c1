"""transformWithStateInPandas port status (BACKLOG item).

``applyInPandasWithState`` carries the production state machine
(``streaming/stateful.py``); Spark's successor API —
``GroupedData.transformWithStateInPandas`` + ``StatefulProcessor`` —
exists in this build but its dedicated Python driver worker crashes in
this container (``TransformWithStateInPySpark driver worker exited
unexpectedly (crashed) SQLSTATE: XXKST``, with the RocksDB provider
configured as the API requires; re-verified this round).

This test IS the port: a minimal keyed running count through a real
file-source stream.  On a runtime whose driver worker survives, it
runs end to end and asserts results — proving the remaining work is
mechanical.  On this container it skips with the pinned failure
signature, so any runtime change that fixes (or alters) the crash
surfaces immediately.
"""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pytest

from tests.test_stateful import T0, _write_file

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
CRASH_SIGNATURE = "TransformWithStateInPySpark driver worker"


def test_transform_with_state_running_count(spark):
    try:
        from pyspark.sql.streaming import StatefulProcessor
    except ImportError:
        pytest.skip("StatefulProcessor API absent from this pyspark build")
    from pyspark.errors.exceptions.captured import StreamingQueryException
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    out_schema = StructType(
        [StructField("site_id", StringType()), StructField("total", LongType())]
    )
    state_schema = StructType([StructField("total", LongType())])

    class RunningCount(StatefulProcessor):
        def init(self, handle) -> None:
            self.state = handle.getValueState("total", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            total = self.state.get()[0] if self.state.exists() else 0
            for pdf in rows:
                total += int(len(pdf))
            self.state.update((total,))
            yield pd.DataFrame({"site_id": [key[0]], "total": [total]})

        def close(self) -> None:
            pass

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    saved_provider = spark.conf.get(provider_key, None)
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "events")
        from datetime import timedelta

        _write_file(spark, os.path.join(src, "f1.parquet"), [("A", T0), ("B", T0)])
        _write_file(
            spark,
            os.path.join(src, "f2.parquet"),
            [("A", T0 + timedelta(minutes=1))],
        )
        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        spark.conf.set(provider_key, ROCKSDB_PROVIDER)  # required by the API
        q = None
        try:
            q = (
                stream.groupBy("site_id")
                .transformWithStateInPandas(
                    RunningCount(),
                    outputStructType=out_schema,
                    outputMode="Update",
                    timeMode="None",
                )
                .writeStream.outputMode("update")
                .format("memory")
                .queryName("tws_out")
                .option("checkpointLocation", os.path.join(d, "ckpt"))
                .start()
            )
            q.processAllAvailable()
            rows = spark.sql("SELECT * FROM tws_out").collect()
        except StreamingQueryException as e:
            if CRASH_SIGNATURE in str(e):
                pytest.skip(
                    "transformWithStateInPandas driver worker crashes in "
                    "this container (known runtime limitation, BACKLOG.md); "
                    "applyInPandasWithState covers the state machine"
                )
            raise
        finally:
            if q is not None:
                q.stop()
            if saved_provider is None:
                spark.conf.unset(provider_key)
            else:
                spark.conf.set(provider_key, saved_provider)

        # state persisted across micro-batches: A's second file raises
        # its running total to 2 while B stays at 1
        best = {}
        for r in rows:
            best[r["site_id"]] = max(best.get(r["site_id"], 0), r["total"])
        assert best == {"A": 2, "B": 1}
