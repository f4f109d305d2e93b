from snowflake_to_postgres_spark.sources.tables import (  # noqa: F401
    TABLES,
    load_table,
    load_tables,
    normalize_external_types,
    register_views,
    table_path,
)
