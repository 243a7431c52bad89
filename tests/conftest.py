import json

import pytest

from dxf_postgis_converter_spark.corpus import SPANS_SCHEMA, build_document, build_zones, ZONES_SCHEMA
from dxf_postgis_converter_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=8,
                  extra_conf={"spark.driver.memory": "4g"})
    yield s
    s.stop()


@pytest.fixture(scope="session")
def docs_df(spark):
    """40 deterministic in-memory documents (same generator as the corpus)."""
    rows = [build_document(i) for i in range(40)]
    return spark.createDataFrame(rows, schema=SPANS_SCHEMA).cache()


@pytest.fixture(scope="session")
def entities_df(spark, docs_df):
    from dxf_postgis_converter_spark.functions.decode import decode_documents
    return decode_documents(docs_df).cache()


@pytest.fixture(scope="session")
def zones_df(spark):
    return spark.createDataFrame(build_zones(), schema=ZONES_SCHEMA).cache()


@pytest.fixture(scope="session")
def media_payloads():
    """All media payloads of 10 docs as python dicts (for pure-fn tests)."""
    out = []
    for i in range(10):
        _, spans = build_document(i)
        out.extend(json.loads(s["media_ref"]) for s in spans if s["kind"] == "media")
    return out
