"""Model-DAG pipeline executor (SURVEY §2.11, operators C1-C6).

Reference semantics: an SSIS package is a DAG of tasks ordered by precedence
constraints (/root/reference/src/parser/ssis_parser.py:507-530) that the
analyzer topo-sorts with a plain dict-based graph
(src/agents/analyzer.py:36-82,351-369); dbt adds ``ref()`` edges between
models, package variables / dbt vars parameterize the SQL
(dbt_project/dbt_project.yml:19-22), and materialization is per-model
(view / table / ephemeral / incremental, dbt_project.yml:24-38).

Spark-first mapping:
- a **model** is a function ``(inputs: dict[str, DataFrame], vars) ->
  DataFrame``; ``ref()`` is just reading another model's entry from the dict.
- ``ephemeral``/``view`` models stay LAZY — chaining DataFrames keeps the
  whole downstream subtree inside ONE Catalyst plan, so filters/pruning flow
  through model boundaries (the optimizer sees through our DAG, unlike a
  SQL-Server-executed dbt graph).
- ``table`` models materialize to parquet and are re-read, cutting the plan
  at exactly the points the user asked to persist.
- independent table materializations can run concurrently (C6) via a thread
  pool — Spark's scheduler interleaves their jobs.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Model:
    """One node of the pipeline DAG (C1).

    ``build`` receives ({input/model name -> DataFrame}, vars-dict) and
    returns the model's DataFrame.  ``deps`` name upstream models (``ref()``
    edges); source tables come from the pipeline's initial inputs.
    """

    name: str
    build: Callable[[dict[str, DataFrame], dict], DataFrame]
    deps: list[str] = field(default_factory=list)
    materialization: str = "view"  # view | ephemeral | table
    path: str | None = None        # parquet target for table materialization


def topo_order(models: dict[str, Model]) -> list[str]:
    """C1: Kahn topo sort over ref() edges (dict-based, like the reference's
    analyzer — no graph library).  Deterministic: ready nodes run in name
    order.  Raises on cycles."""
    indeg = {
        n: sum(1 for d in m.deps if d in models) for n, m in models.items()
    }
    order: list[str] = []
    ready = sorted(n for n, d in indeg.items() if d == 0)
    while ready:
        n = ready.pop(0)
        order.append(n)
        changed = False
        for m_name, m in models.items():
            if n in m.deps:
                indeg[m_name] -= 1
                if indeg[m_name] == 0:
                    ready.append(m_name)
                    changed = True
        if changed:
            ready.sort()
    if len(order) != len(models):
        cyclic = sorted(set(models) - set(order))
        raise ValueError(f"cycle in model DAG involving {cyclic}")
    return order


@dataclass
class Pipeline:
    """C1-C6: topo-ordered model executor with vars and materializations."""

    spark: SparkSession
    models: dict[str, Model] = field(default_factory=dict)
    vars: dict = field(default_factory=dict)

    def add(self, model: Model) -> "Pipeline":
        self.models[model.name] = model
        return self

    def run(
        self,
        inputs: dict[str, DataFrame],
        parallel_tables: bool = False,
    ) -> dict[str, DataFrame]:
        """Build every model in topo order (C1); ``vars`` flow to each build
        (C3/C4).  Returns {model name -> DataFrame} (lazy for view/ephemeral,
        re-read parquet for table)."""
        frames: dict[str, DataFrame] = dict(inputs)
        order = topo_order(self.models)
        writes: list[tuple[str, DataFrame, str]] = []
        for name in order:
            m = self.models[name]
            df = m.build(frames, self.vars)
            if m.materialization == "table":
                if not m.path:
                    raise ValueError(f"table model {name} needs a path")
                writes.append((name, df, m.path))
                # placeholder now; replaced by the parquet re-read after write
                frames[name] = df
            else:
                frames[name] = df
            # flush pending table writes whenever a later model depends on one
            pending = {n for n, _, _ in writes}
            later_needs = any(
                set(self.models[o].deps) & pending
                for o in order[order.index(name) + 1:]
            )
            if writes and later_needs:
                self._flush(writes, frames, parallel_tables)
                writes = []
        if writes:
            self._flush(writes, frames, parallel_tables)
        return frames

    def _flush(self, writes, frames, parallel: bool) -> None:
        """Materialize table models; independent writes submit concurrently
        (C6) — each write is its own Spark job, the scheduler interleaves."""
        def write_one(item):
            name, df, path = item
            df.write.mode("overwrite").parquet(path)
            return name, path

        if parallel and len(writes) > 1:
            with ThreadPoolExecutor(max_workers=len(writes)) as ex:
                done = list(ex.map(write_one, writes))
        else:
            done = [write_one(w) for w in writes]
        for name, path in done:
            frames[name] = self.spark.read.parquet(path)


@dataclass
class ModelRun:
    """Outcome of one model inside a retry-loop run (C5)."""

    name: str
    status: str = "pending"  # success | failed | skipped | pending
    attempts: int = 0
    errors: list[str] = field(default_factory=list)


@dataclass
class RunReport:
    """Pipeline-level outcome of :meth:`Pipeline.run_with_retries` —
    the engine-scope analog of the reference orchestrator's migration
    context summary (src/agents/orchestrator.py:100-123 phase loop,
    src/agents/context.py:128-134 retry budget)."""

    runs: dict[str, ModelRun] = field(default_factory=dict)
    phase: str = "complete"  # complete | failed

    def failed(self) -> list[str]:
        return [n for n, r in self.runs.items() if r.status == "failed"]

    def skipped(self) -> list[str]:
        return [n for n, r in self.runs.items() if r.status == "skipped"]


def run_with_retries(
    pipeline: Pipeline,
    inputs: dict[str, DataFrame],
    max_retries: int = 2,
    validate: dict[str, Callable[[DataFrame], None]] | None = None,
    on_diagnose: Callable[[str, Exception, int], Callable | None] | None = None,
) -> tuple[dict[str, DataFrame], RunReport]:
    """C5: the orchestrator's execute→validate→diagnose→retry state machine,
    scoped to the engine (no agents/LLM — the reference's diagnose step is an
    LLM refiner; here it is a caller hook that may return a REPLACEMENT build
    for the failing model, which is exactly the refiner's contract).

    Per model, in topo order:
    - build (and materialize, for table models) under a try;
    - run the model's ``validate`` check if given (the VALIDATING phase) —
      a validation error re-enters the retry loop like a build error
      (VALIDATION_FAILED -> DIAGNOSING -> retry while the budget allows,
      orchestrator.py:126-166);
    - on failure, call ``on_diagnose(name, exc, attempt)``; if it returns a
      callable, that becomes the model's build for the retry;
    - a model that exhausts ``max_retries`` is marked failed and every
      transitive dependent is SKIPPED (precedence-constraint semantics) —
      independent branches still run to completion.

    Returns (frames, report).  Never raises for model failures; the report
    carries per-model status/attempts/errors and the pipeline phase.
    """
    report = RunReport()
    frames: dict[str, DataFrame] = dict(inputs)
    order = topo_order(pipeline.models)
    dead: set[str] = set()

    for name in order:
        m = pipeline.models[name]
        run = report.runs[name] = ModelRun(name)
        if set(m.deps) & dead:
            run.status = "skipped"
            dead.add(name)
            continue
        build = m.build
        while run.attempts <= max_retries:
            run.attempts += 1
            try:
                df = build(frames, pipeline.vars)
                if m.materialization == "table":
                    if not m.path:
                        raise ValueError(f"table model {name} needs a path")
                    df.write.mode("overwrite").parquet(m.path)
                    df = pipeline.spark.read.parquet(m.path)
                if validate and name in validate:
                    validate[name](df)
                frames[name] = df
                run.status = "success"
                break
            except Exception as exc:  # noqa: BLE001 — budget loop owns it
                run.errors.append(f"{type(exc).__name__}: {exc}")
                if on_diagnose is not None and run.attempts <= max_retries:
                    replacement = on_diagnose(name, exc, run.attempts)
                    if replacement is not None:
                        build = replacement
        if run.status != "success":
            run.status = "failed"
            dead.add(name)
    if dead:
        report.phase = "failed"
    return frames, report


def foreach_partition_values(
    pipeline: Pipeline,
    inputs: dict[str, DataFrame],
    var_name: str,
    values: list,
) -> dict[object, dict[str, DataFrame]]:
    """C2: ForEachLoop container — re-run the pipeline once per variable value
    (the reference's ForEach over table/partition lists,
    src/parser/constants.py:16-18)."""
    results = {}
    for v in values:
        pipeline.vars = {**pipeline.vars, var_name: v}
        results[v] = pipeline.run(inputs)
    return results
