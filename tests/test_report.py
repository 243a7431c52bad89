"""Tier-4 debug/report parity (plans/report.py) — the reference's
report contract: tests/test_debug.py:50 asserts the import report
contains the start marker and the success footer; :93 asserts the
export footer; failures produce ERROR lines and withhold the footer
(import_use_case.py:126-127 returns the report without it)."""

from dxf_postgis_converter_spark.plans.report import PipelineReport


def test_report_contains_pipeline_steps_and_success_footer():
    r = PipelineReport("DXF import")
    r.step("Source tables loaded", sf=0.001)
    r.step("Documents decoded to entities", rows=20548)
    r.step("Point-in-polygon join", zones_with_hits=58)
    text = r.text()
    assert text.splitlines()[0] == "Starting DXF import process"
    assert "Documents decoded to entities: rows=20548" in text
    assert text.splitlines()[-1] == "DXF IMPORT COMPLETED SUCCESSFULLY"


def test_failed_report_has_error_line_and_no_footer():
    r = PipelineReport("DXF import")
    r.step("Source tables loaded")
    r.error("decode stage exploded")
    text = r.text()
    assert "ERROR: decode stage exploded" in text
    assert "COMPLETED SUCCESSFULLY" not in text
    assert r.failed
    # the report stays appendable for diagnosis after the failure
    r.step("cleanup ran")
    assert "cleanup ran" in r.text()


def test_export_process_footer():
    r = PipelineReport("DXF export")
    r.step("Documents exported as .dxf", files=300)
    assert r.text().splitlines()[-1] == "DXF EXPORT COMPLETED SUCCESSFULLY"


def test_text_is_idempotent():
    r = PipelineReport()
    r.step("one")
    assert r.text() == r.text()  # footer appended exactly once per call


def test_spark_submit_job_writes_the_report(tmp_path):
    """The spark-submit pipeline writes <out>/report.txt with the same
    contract (wired in scripts/job_spatial_pipeline.py) — simulated here
    by driving the same PipelineReport calls the job makes, then
    verified end-to-end whenever scripts/submit.sh runs (the r7 session
    artifact records a real report for the sf0.001 run)."""
    r = PipelineReport("DXF import")
    for msg, kv in [("Source tables loaded", {"sf": 0.001}),
                    ("Documents decoded to entities", {"rows": 20548}),
                    ("Point-in-polygon join", {"zones_with_hits": 58}),
                    ("Tile pyramid rollup", {"tiles": 22552}),
                    ("Documents exported as .dxf", {"files": 300}),
                    ("Benchmark contamination sweep", {"pairs": 17})]:
        r.step(msg, **kv)
    out = tmp_path / "report.txt"
    out.write_text(r.text() + "\n", encoding="utf-8")
    body = out.read_text(encoding="utf-8")
    assert body.startswith("Starting DXF import process\n")
    assert body.rstrip().endswith("DXF IMPORT COMPLETED SUCCESSFULLY")
    assert len(body.rstrip().splitlines()) == 8  # start + 6 steps + footer
