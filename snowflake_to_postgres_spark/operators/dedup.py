from snowflake_to_postgres_spark.registry import QuerySpec

SPECS: list[QuerySpec] = []
