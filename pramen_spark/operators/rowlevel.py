"""Config-driven row-level relational operators.

These are the per-row semantics applied around every job, in the exact
decoration order of the reference's task runner
(core/.../runner/task/TaskRunnerBase.scala:365-463):

    schema-check -> processing-timestamp -> info-date column -> batch-id
    column -> per-table transformations/filters/projection ->
    operation-level transformations -> filters

Every operator is a Catalyst expression (``F.expr``) — the entire Spark SQL
scalar-function surface is therefore in scope, stays JVM-side, and
participates in whole-stage codegen + predicate pushdown.
"""

from __future__ import annotations

import datetime as _dt
import re
from typing import Iterable, List, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pramen_spark.config.models import FieldChange, FieldChangeKind, TransformExpr
from pramen_spark.dsl.dateexpr import DateExprEvaluator
from pramen_spark.dsl.interpolate import replace_formatted_date_expression

# Characters replaced with '_' in column names
# (core/.../utils/SparkUtils.scala:112; core/.../config/Keys.scala:51-52).
SPECIAL_CHARACTERS = " ,;{}()\n\t=:+-<>[]*?/\\'\""


def apply_projection(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """``columns = [...]`` — select a subset in guaranteed order
    (core/.../pipeline/IngestionJob.scala:155-160)."""
    if not columns:
        return df
    return df.select(*columns)


def apply_transformations(df: DataFrame, transformations: Iterable[TransformExpr]) -> DataFrame:
    """``transformations = [{col, expr}]`` — add/replace a column with any
    Spark SQL expression; empty expr or "drop" drops the column; optional
    comment becomes column metadata (core/.../utils/SparkUtils.scala:280-304)."""
    for t in transformations:
        expr = (t.expression or "").strip()
        if not expr or expr.lower() == "drop":
            df = df.drop(t.column)
            continue
        col = F.expr(expr)
        if t.comment:
            col = col.alias(t.column, metadata={"comment": t.comment})
            df = df.withColumn(t.column, col)
        else:
            df = df.withColumn(t.column, col)
    return df


def render_filter(
    flt: str,
    info_date: _dt.date,
    date_from: Optional[_dt.date] = None,
    date_to: Optional[_dt.date] = None,
    extra_vars: Optional[dict] = None,
) -> str:
    """Substitute ``@infoDate`` / ``@dateFrom`` / ``@dateTo`` macros and
    ``%...%`` formatted date expressions into a filter string
    (core/.../utils/SparkUtils.scala:316-331)."""
    variables = {"infoDate": info_date, "date": info_date}
    if date_from is not None:
        variables["dateFrom"] = date_from
    if date_to is not None:
        variables["dateTo"] = date_to
    if extra_vars:
        variables.update(extra_vars)
    ev = DateExprEvaluator(variables)
    # @infoDate et al. become date literals usable inside SQL expressions:
    # render as date'yyyy-MM-dd' only when used bare; the reference renders
    # the ISO string, relying on implicit casts — we do the same but wrap
    # bare @infoDate in a typed literal for correctness with DateType cols.
    rendered = replace_formatted_date_expression(flt, ev)
    return rendered


def apply_filters(
    df: DataFrame,
    filters: Sequence[str],
    info_date: _dt.date,
    date_from: Optional[_dt.date] = None,
    date_to: Optional[_dt.date] = None,
) -> DataFrame:
    """Apply boolean Spark SQL filter expressions with date-macro
    substitution. ``@infoDate`` renders as a ``date'...'`` literal so
    comparisons against DateType columns stay sargable (pushdown-friendly)."""
    for flt in filters:
        rendered = render_filter(
            _quote_date_macros(flt), info_date, date_from=date_from, date_to=date_to
        )
        df = df.filter(F.expr(rendered))
    return df


_EXPR_SEGMENT = re.compile(r"@\{[^}]*\}(?:%[^%]*%)?")


def _quote_date_macros(flt: str) -> str:
    """Wrap bare date macros in date literals: ``@infoDate`` ->
    ``date'@infoDate'`` unless already quoted, formatted (``%fmt%``), or
    inside an ``@{...}`` expression segment."""

    def quote_plain(segment: str) -> str:
        out = segment
        for macro in ("@infoDate", "@dateFrom", "@dateTo", "@date"):
            pattern = re.compile(r"(?<!')" + re.escape(macro) + r"(?![A-Za-z_%])")
            out = pattern.sub(f"date'{macro}'", out)
        return out

    parts = []
    last = 0
    for m in _EXPR_SEGMENT.finditer(flt):
        parts.append(quote_plain(flt[last : m.start()]))
        parts.append(m.group())
        last = m.end()
    parts.append(quote_plain(flt[last:]))
    return "".join(parts)


def add_info_date(df: DataFrame, column: str, info_date: _dt.date) -> DataFrame:
    """Stamp the literal info date, replacing an existing column if present
    (TaskRunnerBase.scala:382-386; MetastorePersistenceParquet.scala:90-95)."""
    return df.withColumn(column, F.lit(info_date.isoformat()).cast(T.DateType()))


def add_batch_id(df: DataFrame, column: str, batch_id: int) -> DataFrame:
    """``pramen_batchid = <session batch id>`` (TaskRunnerBase.scala:388-395)."""
    return df.withColumn(column, F.lit(batch_id).cast(T.LongType()))


def add_processing_timestamp(df: DataFrame, column: str) -> DataFrame:
    """Add a processing timestamp if configured
    (SparkUtils.addProcessingTimestamp, core/.../utils/SparkUtils.scala:593)."""
    return df.withColumn(column, F.current_timestamp())


def sanitize_column_name(name: str, special_characters: str = SPECIAL_CHARACTERS) -> str:
    return "".join("_" if c in special_characters else c for c in name)


def sanitize_df_columns(df: DataFrame, special_characters: str = SPECIAL_CHARACTERS) -> DataFrame:
    """Replace special characters in column names with underscores
    (core/.../utils/SparkUtils.scala:112 sanitizeDfColumns)."""
    new_names = [sanitize_column_name(c, special_characters) for c in df.columns]
    if new_names == list(df.columns):
        return df
    return df.toDF(*new_names)


def compare_schemas(old: T.StructType, new: T.StructType) -> List[FieldChange]:
    """Field-by-field diff, mirrors SparkUtils.compareSchemas
    (core/.../utils/SparkUtils.scala:200) -> FieldChange list."""
    changes: List[FieldChange] = []
    old_fields = {f.name.lower(): f for f in old.fields}
    new_fields = {f.name.lower(): f for f in new.fields}
    for name, f_new in new_fields.items():
        if name not in old_fields:
            changes.append(
                FieldChange(FieldChangeKind.NEW, f_new.name, new_type=f_new.dataType.simpleString())
            )
        elif old_fields[name].dataType.simpleString() != f_new.dataType.simpleString():
            changes.append(
                FieldChange(
                    FieldChangeKind.CHANGED_TYPE,
                    f_new.name,
                    old_type=old_fields[name].dataType.simpleString(),
                    new_type=f_new.dataType.simpleString(),
                )
            )
    for name, f_old in old_fields.items():
        if name not in new_fields:
            changes.append(
                FieldChange(
                    FieldChangeKind.DELETED, f_old.name, old_type=f_old.dataType.simpleString()
                )
            )
    return changes


def apply_decorations(
    df: DataFrame,
    info_date: _dt.date,
    info_date_column: Optional[str] = None,
    batch_id_column: Optional[str] = None,
    batch_id: Optional[int] = None,
    processing_timestamp_column: Optional[str] = None,
    transformations: Sequence[TransformExpr] = (),
    filters: Sequence[str] = (),
    columns: Sequence[str] = (),
    sanitize_columns: bool = False,
) -> DataFrame:
    """Full decoration pipeline in reference order
    (TaskRunnerBase.run, core/.../runner/task/TaskRunnerBase.scala:365-463)."""
    if sanitize_columns:
        df = sanitize_df_columns(df)
    if processing_timestamp_column:
        df = add_processing_timestamp(df, processing_timestamp_column)
    if info_date_column:
        df = add_info_date(df, info_date_column, info_date)
    if batch_id_column and batch_id is not None:
        df = add_batch_id(df, batch_id_column, batch_id)
    if transformations:
        df = apply_transformations(df, transformations)
    if filters:
        df = apply_filters(df, filters, info_date)
    if columns:
        df = apply_projection(df, columns)
    return df
