"""ex_hivent_spark.sources subpackage."""
