"""Human-readable pipeline run report — the reference's diagnostic
report contract as a pure accumulator.

Reference: ImportUseCase/ExportUseCase thread a ``report_lines`` list
through every pipeline step (import_use_case.py:100-535,
export_use_case.py:108): a start marker first, one line per completed
step, ``ERROR: …`` terminating lines on failure (the report is returned
WITHOUT a success footer), and an ``… COMPLETED SUCCESSFULLY`` footer
only when every step succeeded. The reference's tier-4 debug tests
(tests/test_debug.py:50,93) assert exactly the start marker and the
success footer — the same contract tests/test_report.py pins here.

This is the text twin of the JSON stage lines the spark-submit pipeline
prints: machines consume the JSON, humans diagnosing a run read this.
Pure stdlib — importable on the driver of any deployment.
"""

from __future__ import annotations


class PipelineReport:
    """Line-oriented run report with the reference's markers."""

    def __init__(self, process: str = "DXF import"):
        self._process = process
        self._lines: list[str] = [f"Starting {process} process"]
        self._failed = False

    @property
    def failed(self) -> bool:
        return self._failed

    def step(self, message: str, **details) -> None:
        """One completed pipeline step, e.g. ``report.step("decode",
        rows=20548)`` → ``decode: rows=20548``."""
        if details:
            kv = ", ".join(f"{k}={v}" for k, v in details.items())
            message = f"{message}: {kv}"
        self._lines.append(message)

    def error(self, message: str) -> None:
        """A failing step: recorded as ``ERROR: …``; the success footer
        is withheld (reference behavior — the report is still returned
        for diagnosis, import_use_case.py:126-127)."""
        self._failed = True
        self._lines.append(f"ERROR: {message}")

    def text(self) -> str:
        """The report so far; appends the success footer exactly once
        when no step failed."""
        lines = list(self._lines)
        if not self._failed:
            footer = f"{self._process.upper()} COMPLETED SUCCESSFULLY"
            if not lines or lines[-1] != footer:
                lines.append(footer)
        return "\n".join(lines)
