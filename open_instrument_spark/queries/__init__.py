"""Domain query modules populating the registry (split from the
monolithic registry.py in r6). Import open_instrument_spark.registry,
not these, from external code — registry controls driver-window order
and re-exports."""
