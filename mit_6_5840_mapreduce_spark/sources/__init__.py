from mit_6_5840_mapreduce_spark.sources.tables import (  # noqa: F401
    TABLES,
    load_table,
    load_tables,
    register_views,
)
