"""ex_hivent_spark.streaming subpackage."""
