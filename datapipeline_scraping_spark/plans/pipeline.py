"""Config-driven pipeline builder — the reference's best idea, kept.

In the reference the YAML ``pipeline:`` block IS the logical plan: an
ordered stage list folded left-to-right over record batches
(``src/scrapers/scraper.py:130-138``, ``configs/colombia.yml:21-33``).
Here the same idea emits a DataFrame DAG instead: each stage is a
declarative op over a symbol table of named frames, and Catalyst is
the executor that replaces the deque loop (SURVEY.md §3.2).

Stage vocabulary (one dict per stage; ``in``/``out`` name frames in
the symbol table, defaulting to the previous stage's output):

    {op: scan,        table: documents, out: docs}
    {op: filter,      expr: "doc_id % 2 = 0"}
    {op: project,     cols: {k: "trim(lookup_key)", ...}}   # P1/P12
    {op: checksum,    fields: [a, b], out_col: row_hash}    # H1
    {op: delta_split, state: state_frame, key: k,
                      changed: d1, bypass: d2}              # H2/H3
    {op: overlay,     detail: detail_frame, on: k}          # U2
    {op: classify_rules, text_cols: [a, b]}                 # C1+C3
    {op: union_accreted, other: frame}                      # U1
    {op: normalize_nulls}                                   # P15
    {op: select,      cols: [a, b, c]}

``spark.sql``-style expression strings keep the config engine-neutral
(they are Catalyst expressions, the engine's native predicate pushdown
surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.checksum import row_checksum
from ..functions.cleaning import normalize_empty_to_null
from ..operators.classify import DEFAULT_CONFIG, ClassifierConfig, classify_rules_only
from ..operators.delta import delta_split
from ..operators.merge import overlay_merge, union_accreted
from ..sources.tables import load_table


def build_pipeline(
    spark: SparkSession,
    config: dict,
    sf_dir: str,
    *,
    frames: dict[str, DataFrame] | None = None,
    classifier: ClassifierConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Fold the stage list into a DataFrame, reference-style."""
    sym: dict[str, DataFrame] = dict(frames or {})
    cur: DataFrame | None = None

    def resolve(name: str | None) -> DataFrame:
        if name is None:
            if cur is None:
                raise ValueError("stage needs an input but none is bound yet")
            return cur
        return sym[name]

    for stage in config["stages"]:
        op = stage["op"]
        df = resolve(stage.get("in")) if op != "scan" else None

        if op == "scan":
            out = load_table(spark, sf_dir, stage["table"])
        elif op == "filter":
            out = df.filter(F.expr(stage["expr"]))
        elif op == "project":
            out = df.select(
                *[F.expr(e).alias(name) for name, e in stage["cols"].items()]
            )
        elif op == "with_columns":
            out = df
            for name, e in stage["cols"].items():
                out = out.withColumn(name, F.expr(e))
        elif op == "checksum":
            out = df.withColumn(
                stage.get("out_col", "row_hash"), row_checksum(stage["fields"])
            )
        elif op == "delta_split":
            changed, bypass = delta_split(
                df,
                sym[stage["state"]],
                stage["key"],
                stage.get("hash_col", "row_hash"),
            )
            sym[stage["changed"]] = changed
            sym[stage["bypass"]] = bypass
            cur = changed
            continue
        elif op == "overlay":
            out = overlay_merge(df, sym[stage["detail"]], on=stage["on"])
        elif op == "classify_rules":
            out = classify_rules_only(df, classifier, tuple(stage["text_cols"]))
        elif op == "union_accreted":
            out = union_accreted(df, sym[stage["other"]])
        elif op == "normalize_nulls":
            out = normalize_empty_to_null(df)
        elif op == "select":
            out = df.select(*stage["cols"])
        else:
            raise ValueError(f"unknown pipeline op {op!r}")

        cur = out
        if "out" in stage:
            sym[stage["out"]] = out

    return cur


def load_pipeline_config(path: str) -> dict:
    """Load a pipeline config from YAML — the reference's
    config-loading seam (``src/scrapers/config_loader.py:10-21``)
    pointed at the engine's stage vocabulary. Ships with
    ``configs/etl_documents.yml`` as the worked example."""
    import yaml

    with open(path) as fh:
        cfg = yaml.safe_load(fh)
    if "stages" not in cfg:
        raise ValueError(f"pipeline config {path!r} has no 'stages' list")
    return cfg
