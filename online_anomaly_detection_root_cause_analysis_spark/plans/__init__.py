from .checks import explain_str, plan_has, pushed_filters, read_schema_columns

__all__ = ["explain_str", "plan_has", "pushed_filters", "read_schema_columns"]
