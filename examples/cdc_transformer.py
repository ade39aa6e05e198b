"""Example user transformers: CDC snapshot maintenance as pipeline steps.

Shows how the warehouse-maintenance operators (operators/cdc.py) compose
inside the reference-style Transformer contract: a change batch lands
next to the current snapshot, ``CdcMergeTransformer`` folds it in
(latest-wins upserts/deletes), and ``Scd2Transformer`` rebuilds the
Type-2 attribute history from the merged table. Referenced by
``cdc_ingestion.conf``; load by putting this directory on PYTHONPATH.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pramen_spark.api import Reason, Transformer
from pramen_spark.operators.cdc import apply_cdc, scd2_history


def _cols(options, key):
    return [c.strip() for c in options[key].split(",") if c.strip()]


class CdcMergeTransformer(Transformer):
    """Options: ``snapshot.table``, ``changes.table``, ``key.columns``
    (comma-separated), ``seq.column``; optional ``op.column`` (default
    "op") and ``delete.op`` (default "D")."""

    def validate(self, metastore, info_date, options) -> Reason:
        for opt in ("snapshot.table", "changes.table", "key.columns", "seq.column"):
            if opt not in options:
                return Reason.not_ready(f"Option '{opt}' is not defined")
        return Reason.ready()

    def run(self, metastore, info_date, options) -> DataFrame:
        snap = metastore.get_table(options["snapshot.table"])
        changes = metastore.get_table(options["changes.table"])
        # the metastore decorates both sides with its info-date column;
        # the CDC contract compares data columns only
        def undecorated(df):
            return df.drop(*[c for c in df.columns if c.startswith("pramen_")])

        return apply_cdc(
            undecorated(snap),
            undecorated(changes),
            key_cols=_cols(options, "key.columns"),
            seq_col=options["seq.column"],
            op_col=options.get("op.column", "op"),
            delete_op=options.get("delete.op", "D"),
        )


class Scd2Transformer(Transformer):
    """Options: ``input.table``, ``key.columns``, ``attr.columns``,
    ``date.column`` (cast to DATE); optional ``tiebreak.columns``."""

    def validate(self, metastore, info_date, options) -> Reason:
        for opt in ("input.table", "key.columns", "attr.columns", "date.column"):
            if opt not in options:
                return Reason.not_ready(f"Option '{opt}' is not defined")
        return Reason.ready()

    def run(self, metastore, info_date, options) -> DataFrame:
        df = metastore.get_table(options["input.table"])
        date_col = options["date.column"]
        df = df.withColumn(date_col, F.to_date(F.col(date_col)))
        ties = (
            _cols(options, "tiebreak.columns")
            if "tiebreak.columns" in options
            else None
        )
        return scd2_history(
            df,
            key_cols=_cols(options, "key.columns"),
            attr_cols=_cols(options, "attr.columns"),
            date_col=date_col,
            tiebreak_cols=ties,
        )
