"""U4/F5 — the reference's fetch-queue scheduling policies as a
distributed, observable operator.

The reference's ``_run_stage`` loop (``src/scrapers/scraper.py:83-126``)
drains ONE work deque in rounds: take the first ``conc`` items, fetch
them concurrently, then

- **U4, requeue ordering** (``:124-126``): failures are re-appended
  FIFO when the round's error rate is <= 10 %, else REVERSED (LIFO) —
  a burst of failures retries the most recent first;
- **F5, adaptive concurrency ramp** (``:117-121``): when the round's
  error rate is < 5 % and concurrency is below the configured
  maximum, concurrency jumps to ``min(max_conc, 10)`` (the reference
  jumps straight to the cap — it does not step).

Both policies are SEQUENTIAL by nature — round N+1's batch depends on
round N's failures — so Spark cannot parallelize one queue. What it
CAN do, and the reason this is an engine operator rather than a
scheduler footnote, is run MILLIONS of independent queues (one per
source/domain — exactly how a production crawl shards) data-parallel:
``groupBy(source).applyInPandas`` folds each source's queue on one
executor with bounded state (the queue itself), while every other
source folds elsewhere. A single pathological source serializes only
itself — the same bound the reference has for its one queue.

Failure outcomes are deterministic (md5 of source|task|attempt against
a per-task failure percentage), which makes the whole trace — batch
membership, retry counts, completion rounds, the concurrency series —
a pure function of the input and therefore DuckDB-oracle-checkable
(recursive CTE replaying the same integer arithmetic; see
queries_r8.py q145/q146). All rate comparisons are integer-exact
(``n_fail * 10 <= n_batch`` for the 10 % gate, ``n_fail * 20 <
n_batch`` for the 5 % gate) so the two engines can never disagree on a
boundary.
"""

from __future__ import annotations

import hashlib
from collections import deque

from pyspark.sql import DataFrame
from pyspark.sql import types as T

#: attempt cap: the reference retries list failures forever (the queue
#: drains only when everything eventually succeeds); a bounded engine
#: marks a task 'dropped' after this many failed attempts instead so
#: termination is guaranteed and observable.
MAX_ATTEMPTS = 8

#: default queue parameters, shared with the DuckDB oracle template
#: (queries_r8.py::_SCHED_SIM_TEMPLATE interpolates THESE, so changing a
#: default here cannot silently diverge the two engines — ADVICE r8).
DEFAULT_CONC0 = 2
DEFAULT_MAX_CONC = 12

ROUND_SCHEMA = T.StructType([
    T.StructField("source", T.StringType()),
    T.StructField("round", T.LongType()),
    T.StructField("conc", T.LongType()),
    T.StructField("n_batch", T.LongType()),
    T.StructField("n_fail", T.LongType()),
    T.StructField("mode", T.StringType()),
])

TASK_SCHEMA = T.StructType([
    T.StructField("source", T.StringType()),
    T.StructField("task", T.LongType()),
    T.StructField("attempts", T.LongType()),
    T.StructField("status", T.StringType()),
    T.StructField("final_round", T.LongType()),
])


def _fails(source: str, task: int, attempt: int, fail_pct: int) -> bool:
    """Deterministic fetch outcome: md5(source|task|attempt) % 100
    against the task's failure percentage. Independent per attempt, so
    a flaky task eventually succeeds (or hits MAX_ATTEMPTS)."""
    h = hashlib.md5(f"{source}|{task}|{attempt}".encode()).hexdigest()
    return int(h[:4], 16) % 100 < fail_pct


def fold_queue(
    source: str,
    tasks: list[tuple[int, int]],
    *,
    conc0: int,
    max_conc: int,
) -> tuple[list[tuple], list[tuple]]:
    """Replay one source's fetch queue; ``tasks`` = [(task_id,
    fail_pct)] in queue order. Returns (per_round, per_task) traces.
    Pure function — the DuckDB oracle replays it with the same integer
    arithmetic.

    Ramp quirk (faithful to the reference, ``src/scrapers/
    scraper.py:117-121``): a clean round jumps concurrency to
    ``min(max_conc, 10)`` — which LOWERS it when the caller starts
    with ``conc0`` in ``(10, max_conc)``. The reference never hits
    that range (it starts low and ramps up), and the monotone
    no-lowering property tested in test_operators.py holds only for
    ``conc0 <= 10``; callers starting above 10 get the reference's
    literal behavior, quirk included."""
    queue = deque((t, 0, fp) for t, fp in tasks)
    conc = conc0
    rnd = 0
    per_round: list[tuple] = []
    per_task: list[tuple] = []
    while queue:
        rnd += 1
        k = min(conc, len(queue))
        batch = [queue.popleft() for _ in range(k)]
        fails = [_fails(source, t, att + 1, fp) for (t, att, fp) in batch]
        nf = sum(fails)
        for (t, att, fp), failed in zip(batch, fails):
            if not failed:
                per_task.append((source, t, att + 1, "done", rnd))
            elif att + 1 >= MAX_ATTEMPTS:
                per_task.append((source, t, att + 1, "dropped", rnd))
        # U4: FIFO requeue at <=10% error rate, LIFO above (integer-
        # exact: nf/k <= 0.10  <=>  nf*10 <= k)
        mode = "fifo" if nf * 10 <= k else "lifo"
        per_round.append((source, rnd, conc, k, nf, mode))
        requeue = [
            (t, att + 1, fp)
            for (t, att, fp), failed in zip(batch, fails)
            if failed and att + 1 < MAX_ATTEMPTS
        ]
        queue.extend(requeue if mode == "fifo" else reversed(requeue))
        # F5: ramp AFTER the round, straight to min(max_conc, 10) —
        # the reference's exact (non-stepping) jump; 5% gate is
        # nf/k < 0.05  <=>  nf*20 < k
        if nf * 20 < k and conc < max_conc:
            conc = min(max_conc, 10)
    return per_round, per_task


def simulate_fetch_rounds(
    df: DataFrame,
    *,
    source_col: str = "source",
    task_col: str = "task",
    fail_pct_col: str = "fp",
    conc0: int = DEFAULT_CONC0,
    max_conc: int = DEFAULT_MAX_CONC,
    emit: str = "rounds",
) -> DataFrame:
    """Distributed queue-policy simulation: one independent fetch
    queue per ``source_col`` group (ordered by ``task_col``), folded
    in parallel via ``applyInPandas`` (declared Arrow seam). ``emit``
    selects the trace: ``"rounds"`` (per-round concurrency/error/mode
    — the F5 observable) or ``"tasks"`` (per-task attempts/status/
    completion round — the U4 observable)."""
    if emit not in ("rounds", "tasks"):
        raise ValueError(f"emit must be 'rounds' or 'tasks', got {emit!r}")
    schema = ROUND_SCHEMA if emit == "rounds" else TASK_SCHEMA
    want_rounds = emit == "rounds"

    def run(pdf):
        import pandas as pd

        src = str(pdf[source_col].iloc[0])
        pdf = pdf.sort_values(task_col)
        tasks = list(
            zip(
                (int(x) for x in pdf[task_col]),
                (int(x) for x in pdf[fail_pct_col]),
            )
        )
        rounds, task_rows = fold_queue(
            src, tasks, conc0=conc0, max_conc=max_conc
        )
        rows = rounds if want_rounds else task_rows
        return pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return (
        df.select(source_col, task_col, fail_pct_col)
        .groupBy(source_col)
        .applyInPandas(run, schema=schema)
    )
