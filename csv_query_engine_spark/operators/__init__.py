"""Custom operators Spark lacks as built-ins, composed from DataFrame
primitives (SURVEY.md §2 Tier B "joins" row: range/as-of joins)."""
