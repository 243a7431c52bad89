"""S1/S3 real-DXF ingest seam: binaryFile plumbing real, parser gated."""

import pytest

from dxf_postgis_converter_spark.sources.dxf_files import (
    HAVE_EZDXF,
    dxf_files_to_documents,
    read_world_file,
    scan_dxf_files,
)


@pytest.fixture()
def dxf_dir(tmp_path):
    (tmp_path / "a.dxf").write_bytes(b"0\nSECTION\n2\nENTITIES\n0\nENDSEC\n0\nEOF\n")
    (tmp_path / "b.txt").write_bytes(b"not a dxf")
    return str(tmp_path)


def test_binary_scan_globs_dxf_only(spark, dxf_dir):
    files = scan_dxf_files(spark, dxf_dir)
    rows = files.collect()
    assert len(rows) == 1 and rows[0].path.endswith("a.dxf")
    assert rows[0].length > 0 and bytes(rows[0].content).startswith(b"0\n")


@pytest.mark.skipif(HAVE_EZDXF, reason="stub branch only without ezdxf")
def test_parse_raises_documented_stub(spark, dxf_dir):
    docs = dxf_files_to_documents(scan_dxf_files(spark, dxf_dir))
    from py4j.protocol import Py4JJavaError
    with pytest.raises(Exception) as ei:
        docs.collect()
    assert "ezdxf" in str(ei.value)


def test_world_file_parse():
    wf = "2.0\n0.0\n0.0\n-2.0\n100.5\n300.25\n"
    p = read_world_file(wf)
    assert p == {"a": 2.0, "b": 0.0, "c": 100.5, "d": 0.0, "e": -2.0, "f": 300.25}
    with pytest.raises(ValueError):
        read_world_file("1\n2\n3\n")
