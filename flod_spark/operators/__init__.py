"""Custom operators Spark lacks natively (SURVEY.md §2.5), composed from
DataFrame primitives — no custom Catalyst rules needed (SURVEY §4.2-4)."""
