from open_instrument_spark.sources.tables import Tables, load_tables, points_from_dir  # noqa: F401
