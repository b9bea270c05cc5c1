from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from scats_transis_kinesis_spark.session import get_session

    spark = get_session(
        app_name="tests",
        shuffle_partitions=4,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    yield spark
    spark.stop()


# Canned XML fixtures shaped like the reference's embedded ones
# (reference: tests.py:19,59-60).
XML_TWO_SITES = (
    '<TransisResponse error="false">'
    "<DetectorCountMessages>"
    '<DetectorCountMessage reg="ROZ" Sid="2087" date="2019-10-03T15:43:00+10:00">'
    '<Detectors><Detector Did="1" count="5"/><Detector Did="2" count="3"/>'
    '<Detector count="9"/><Detector Did="18" count="12"/></Detectors>'
    "</DetectorCountMessage>"
    '<DetectorCountMessage reg="ROZ" Sid="8" date="2019-10-03T15:43:00+10:00">'
    "<Detectors></Detectors>"
    "</DetectorCountMessage>"
    "</DetectorCountMessages>"
    "</TransisResponse>"
)

XML_ERROR = (
    '<TransisResponse error="true">'
    '<Errors><Error msg="Invalid something"/></Errors>'
    "</TransisResponse>"
)

XML_EMPTY = "<TransisResponse><DetectorCountMessages></DetectorCountMessages></TransisResponse>"
