from pramen_spark.dsl.dateexpr import DateExprEvaluator, eval_date_expr
from pramen_spark.dsl.interpolate import replace_formatted_date_expression

__all__ = ["DateExprEvaluator", "eval_date_expr", "replace_formatted_date_expression"]
