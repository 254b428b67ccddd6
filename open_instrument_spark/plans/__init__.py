from open_instrument_spark.plans.api import GetRequest, get, list_variables  # noqa: F401
