from etly_spark.io.tables import TABLES, load_table, load_tables  # noqa: F401
