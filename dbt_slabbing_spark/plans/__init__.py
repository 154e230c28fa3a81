"""Query planning front-ends: the dbt-style SQL model runner."""
