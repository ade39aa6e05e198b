from pramen_spark.operators.rowlevel import (
    add_batch_id,
    add_info_date,
    add_processing_timestamp,
    apply_decorations,
    apply_filters,
    apply_projection,
    apply_transformations,
    compare_schemas,
    sanitize_df_columns,
)

__all__ = [
    "add_batch_id",
    "add_info_date",
    "add_processing_timestamp",
    "apply_decorations",
    "apply_filters",
    "apply_projection",
    "apply_transformations",
    "compare_schemas",
    "sanitize_df_columns",
]
