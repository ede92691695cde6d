"""Validation report rollup (SURVEY §2.14 reporting surface).

The reference's validator aggregates per-model check results into two
artifacts — ``validation_log.json`` (machine-readable, the full report
object) and ``validation_report.md`` (a summary table plus per-model
sections) — at /root/reference/src/validation/validator.py:393-531.  This
module is the engine-side analog: :class:`CheckResult` objects produced by
``operators.quality`` roll up into a :class:`ValidationReport` with the same
verdict vocabulary (pass / warning / fail, worst-wins overall status) and the
same two serializations.

Everything here is driver-side bookkeeping over already-computed scalar
verdicts — no Spark work happens in this module, so report generation costs
the same at 100 TB as at 100 rows.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from datetime import datetime, timezone
from pathlib import Path

from .quality import CheckResult

_STATUS_EMOJI = {"pass": "✅", "warning": "⚠️", "fail": "❌", "skipped": "⏭️"}
_STATUS_RANK = {"pass": 0, "skipped": 0, "warning": 1, "fail": 2}


def _worst(statuses: list[str]) -> str:
    if not statuses:
        return "skipped"
    return max(statuses, key=lambda s: _STATUS_RANK.get(s, 2))


@dataclass
class ModelValidation:
    """All checks for one model/table (validator.py ModelValidation)."""

    model_name: str
    checks: list[CheckResult] = field(default_factory=list)

    def add(self, check: CheckResult) -> "ModelValidation":
        self.checks.append(check)
        return self

    @property
    def overall_status(self) -> str:
        return _worst([c.status for c in self.checks])

    def to_dict(self) -> dict:
        return {
            "model_name": self.model_name,
            "overall_status": self.overall_status,
            "checks": [
                {"check": c.check, "status": c.status, "detail": c.detail}
                for c in self.checks
            ],
        }


@dataclass
class ValidationReport:
    """Rollup of every model's checks (validator.py ValidationReport)."""

    model_validations: list[ModelValidation] = field(default_factory=list)
    generated_at: datetime = field(
        default_factory=lambda: datetime.now(timezone.utc)
    )

    def add_model(self, model: ModelValidation) -> "ValidationReport":
        self.model_validations.append(model)
        return self

    @property
    def total_models(self) -> int:
        return len(self.model_validations)

    @property
    def models_passed(self) -> int:
        return sum(1 for m in self.model_validations if m.overall_status == "pass")

    @property
    def models_warning(self) -> int:
        return sum(
            1 for m in self.model_validations if m.overall_status == "warning"
        )

    @property
    def models_failed(self) -> int:
        return sum(1 for m in self.model_validations if m.overall_status == "fail")

    @property
    def overall_status(self) -> str:
        return _worst([m.overall_status for m in self.model_validations])

    def to_dict(self) -> dict:
        return {
            "generated_at": self.generated_at.isoformat(),
            "total_models": self.total_models,
            "models_passed": self.models_passed,
            "models_warning": self.models_warning,
            "models_failed": self.models_failed,
            "overall_status": self.overall_status,
            "model_validations": [m.to_dict() for m in self.model_validations],
        }

    def export_json(self, output_path: str | Path) -> Path:
        """validation_log.json (validator.py:393-400)."""
        output_path = Path(output_path)
        output_path.write_text(
            json.dumps(self.to_dict(), indent=2, default=str)
        )
        return output_path

    def to_markdown(self) -> str:
        """validation_report.md body (validator.py:402-531): summary table,
        then one section per model with a per-check verdict table."""
        lines = [
            "# Migration Validation Report",
            "",
            f"**Generated**: {self.generated_at.strftime('%Y-%m-%d %H:%M:%S')}",
            "",
            "## Summary",
            "",
            "| Metric | Value |",
            "|--------|-------|",
            f"| Total Models | {self.total_models} |",
            f"| Passed | {self.models_passed} |",
            f"| Failed | {self.models_failed} |",
            f"| Warnings | {self.models_warning} |",
            f"| Overall Status | **{self.overall_status.upper()}** |",
            "",
            "## Model Validations",
            "",
        ]
        for mv in self.model_validations:
            emoji = _STATUS_EMOJI.get(mv.overall_status, "❓")
            lines.extend(
                [
                    f"### {mv.model_name} {emoji}",
                    "",
                    "| Check | Status | Detail |",
                    "|-------|--------|--------|",
                ]
            )
            for c in mv.checks:
                detail = "; ".join(f"{k}={v}" for k, v in sorted(c.detail.items()))
                lines.append(
                    f"| {c.check} | {c.status.upper()} | {detail} |"
                )
            lines.append("")
        return "\n".join(lines)

    def generate_report(self, output_path: str | Path) -> Path:
        output_path = Path(output_path)
        output_path.write_text(self.to_markdown())
        return output_path
